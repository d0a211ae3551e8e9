"""Measured PIPELINE-level reference baseline (VERDICT r2 weak #6 / item 7).

Round 2 measured the reference's guided-DDIM *sampler* on this host
(bench_reference_torch.py); the pipeline-level claim (episodes/min for
sample -> FD-solver rollout -> J/safety metrics, the posttrain-eval loop)
had no measured denominator. This drives the ACTUAL reference loop
(1D/model/diffusion.py::sample -> 1D/utils/metrics.py::control_trajectories
-> evaluate_samples, i.e. PostTrainPipeline.evaluate_model's body,
1D/posttrain/post_train.py:313-351) and our fused jitted equivalent
(tasks/burgers/pipeline.py::BurgersPipeline._evaluate) on the SAME host
CPU, same batch/DDIM-steps/model topology.

An "episode" = one test sample carried through sampling + 10,000-step FD
solve + metrics. Reported: sec/episode each side + the same-hardware ratio.

Run: PYTHONPATH=/root/repo:$PYTHONPATH JAX_PLATFORMS=cpu \
       python experiments/bench_reference_pipeline.py
"""
import json
import sys
import time

BATCH = 4
DDIM_STEPS = 10  # per-step sampler cost is constant; keeps CPU runtime sane
U_BOUND = 0.8


def bench_torch():
    sys.path.insert(0, "/root/reference/1D")
    import torch

    from model.unet import Unet2D
    from model.diffusion import GaussianDiffusion
    from utils.metrics import control_trajectories, evaluate_samples

    torch.manual_seed(0)
    net = Unet2D(dim=128, dim_mults=(1, 2, 4, 8), channels=3)
    model = GaussianDiffusion(
        net, seq_length=(16, 128), timesteps=1000, sampling_timesteps=DDIM_STEPS,
        ddim_sampling_eta=1.0, temporal=True, use_conv2d=True,
        is_condition_u0=True, is_condition_uT=True, auto_normalize=False,
    )
    model.eval()

    def nablaJ(x):
        s_mean = x[:, 2, :11, :].mean(dim=(1, 2))
        loss = (torch.relu(s_mean - U_BOUND**2) * 500.0).sum()
        return torch.autograd.grad(loss, x)[0]

    u0 = torch.zeros(BATCH, 128)
    uT = torch.zeros(BATCH, 128)
    u_target = torch.zeros(BATCH, 11, 128)

    def episode():
        with torch.no_grad():
            diffused = model.sample(batch_size=BATCH, u_init=u0, u_final=uT,
                                    nablaJ=nablaJ, guidance_u0=True,
                                    enable_grad=False)
        diffused = diffused * 10.0  # unscale (reference /10 normalization)
        u_controlled = control_trajectories(diffused, 11)
        return evaluate_samples(diffused, u_controlled, u_target, 11, U_BOUND)

    episode()  # warmup (torch autotune/threadpool spinup)
    t0 = time.perf_counter()
    m = episode()
    dt = time.perf_counter() - t0
    return dt / BATCH, m


def bench_jax():
    import jax

    # the container's sitecustomize pins the axon TPU plugin regardless of
    # JAX_PLATFORMS env; config.update is the reliable CPU override
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    assert jax.default_backend() == "cpu", (
        f"CPU override failed; got {jax.default_backend()!r}")

    import numpy as np

    from safediffcon_tpu.tasks.burgers.config import BurgersConformalConfig
    from safediffcon_tpu.tasks.burgers.data import BurgersDataset, stack_and_pad
    from safediffcon_tpu.tasks.burgers.pipeline import (
        BurgersPipeline, init_params,
    )

    conf = BurgersConformalConfig(ddim_sampling_steps=DDIM_STEPS,
                                  test_batch_size=BATCH)
    pipe = BurgersPipeline(conf)
    params = init_params(pipe.model, jax.random.PRNGKey(0))

    rng = np.random.default_rng(0)
    u = rng.normal(size=(BATCH, 11, 128)).astype(np.float32)
    f = rng.normal(size=(BATCH, 10, 128)).astype(np.float32)
    test = BurgersDataset(data=stack_and_pad(u, f), u_phys=u, f_phys=f)

    Q = jnp.zeros(())
    # warmup/compile
    pipe.evaluate(params, test, Q, jax.random.PRNGKey(1))
    t0 = time.perf_counter()
    m = pipe.evaluate(params, test, Q, jax.random.PRNGKey(2))
    dt = time.perf_counter() - t0
    return dt / BATCH, m


def main():
    jax_s, jax_m = bench_jax()
    torch_s, torch_m = bench_torch()
    print(json.dumps({
        "host": "same CPU, single process",
        "batch": BATCH, "ddim_steps": DDIM_STEPS,
        "episode": "guided DDIM sample -> 10k-step FD solve -> J/safety metrics",
        "torch_reference_sec_per_episode": round(torch_s, 3),
        "jax_fused_sec_per_episode": round(jax_s, 3),
        "jax_over_torch_speedup_same_hardware": round(torch_s / jax_s, 2),
        "torch_episodes_per_min_cpu": round(60.0 / torch_s, 2),
        "jax_episodes_per_min_cpu": round(60.0 / jax_s, 2),
    }))


if __name__ == "__main__":
    main()
