"""Measured reference baseline: the torch guided-DDIM loop vs our fused JAX
sampler, both on the SAME host CPU (this box has no NVIDIA GPU, and the
reference repo publishes no numbers — BASELINE.md).

Drives the actual reference code (/root/reference/1D/model/diffusion.py
ddim_sample with a nablaJ guidance closure identical in math to ours) and
our ddim_sample at the same batch/steps/model topology, and reports
per-sample-step wall time for each. The hardware-independent ratio
(framework + fusion overhead) anchors bench.py's vs_baseline derivation.

Run: PYTHONPATH=/root/repo:$PYTHONPATH JAX_PLATFORMS=cpu python experiments/bench_reference_torch.py
"""
import json
import sys
import time

BATCH = 4
DDIM_STEPS = 10  # per-step cost is constant; few steps keep CPU runtime sane
U_BOUND_SQ = 0.64


def bench_torch():
    sys.path.insert(0, "/root/reference/1D")
    import torch

    from model.unet import Unet2D
    from model.diffusion import GaussianDiffusion

    torch.manual_seed(0)
    net = Unet2D(dim=128, dim_mults=(1, 2, 4, 8), channels=3)
    model = GaussianDiffusion(
        net, seq_length=(16, 128), timesteps=1000, sampling_timesteps=DDIM_STEPS,
        ddim_sampling_eta=1.0, temporal=True, use_conv2d=True,
        is_condition_u0=True, is_condition_uT=True, auto_normalize=False,
    )
    model.eval()

    def nablaJ(x):
        # same math as tasks/burgers/task.py::guidance_values (w_score=500)
        s_mean = x[:, 2, :11, :].mean(dim=(1, 2))
        loss = (torch.relu(s_mean - U_BOUND_SQ) * 500.0).sum()
        return torch.autograd.grad(loss, x)[0]

    u0 = torch.zeros(BATCH, 128)
    uT = torch.zeros(BATCH, 128)

    def run():
        with torch.no_grad():
            return model.sample(batch_size=BATCH, u_init=u0, u_final=uT,
                                nablaJ=nablaJ, guidance_u0=True,
                                enable_grad=False)

    run()  # warmup
    t0 = time.perf_counter()
    run()
    dt = time.perf_counter() - t0
    return dt / DDIM_STEPS / BATCH


def bench_jax():
    import jax
    import jax.numpy as jnp

    assert jax.default_backend() == "cpu", (
        "run with the TPU plugin env stripped (see __graft_entry__._TPU_PLUGIN_ENV); "
        f"got backend {jax.default_backend()!r}"
    )

    from safediffcon_tpu.core.diffusion import DiffusionConfig
    from safediffcon_tpu.core.sampling import ddim_sample
    from safediffcon_tpu.core.schedules import make_schedule
    from safediffcon_tpu.models.unet2d import UNet2D
    from safediffcon_tpu.tasks.burgers.task import (
        COND_IDX, BurgersConditioner, BurgersTaskConfig, guidance_values,
    )

    model = UNet2D(dim=128, dim_mults=(1, 2, 4, 8), channels=3,
                   resnet_block_groups=1)
    sched = make_schedule(1000, "cosine")
    dcfg = DiffusionConfig(timesteps=1000, sampling_timesteps=DDIM_STEPS,
                           ddim_eta=1.0)
    tc = BurgersTaskConfig(w_score=500.0)
    g = jax.grad(lambda x: guidance_values(x, jnp.zeros(()), tc).sum())

    rng = jax.random.PRNGKey(0)
    shape = (BATCH, 16, 128, 3)
    params = model.init(rng, jnp.zeros((1,) + shape[1:]), jnp.zeros((1,), jnp.int32))
    state = jax.random.normal(rng, shape)

    @jax.jit
    def run(params, rng, state):
        cond = BurgersConditioner(u0=state[:, 0, :, 0], uT=state[:, COND_IDX, :, 0])
        return ddim_sample(model.apply, params, sched, dcfg, rng, state.shape,
                           cond=cond, guidance_grad=g)

    run(params, jax.random.PRNGKey(1), state).block_until_ready()  # compile
    t0 = time.perf_counter()
    run(params, jax.random.PRNGKey(2), state).block_until_ready()
    dt = time.perf_counter() - t0
    return dt / DDIM_STEPS / BATCH


def main():
    jax_s = bench_jax()
    torch_s = bench_torch()
    print(json.dumps({
        "host": "same CPU, single process",
        "batch": BATCH, "ddim_steps": DDIM_STEPS,
        "torch_reference_sec_per_sample_step": round(torch_s, 4),
        "jax_fused_sec_per_sample_step": round(jax_s, 4),
        "jax_over_torch_speedup_same_hardware": round(torch_s / jax_s, 2),
    }))


if __name__ == "__main__":
    main()
