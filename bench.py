"""Headline benchmark: guided denoise steps/sec/chip on the flagship 1D config.

Measures the fused guided-DDIM sampler (UNet2D dim 128, batch 50 test set,
200 DDIM steps with safety-guidance gradient — the reproduce-InfFT inference
hot path, reference: 1D/scripts/reproduce_InfFT.sh + 1D/model/diffusion.py:451-555)
on the available accelerator and prints ONE JSON line.

`vs_baseline` compares against the PyTorch reference's host-driven loop on
its original single-GPU setup, estimated at 40 guided denoise steps/sec
(dim-128 UNet2D forward + autograd guidance per step, one kernel launch
chain per step; the repo publishes no numbers — BASELINE.md). The north-star
target is >=10x (BASELINE.json).
"""
import json
import time

import jax
import jax.numpy as jnp

from safediffcon_tpu.core.diffusion import DiffusionConfig
from safediffcon_tpu.core.sampling import ddim_sample
from safediffcon_tpu.core.schedules import make_schedule
from safediffcon_tpu.models.unet2d import UNet2D
from safediffcon_tpu.tasks.burgers.task import (
    COND_IDX,
    BurgersConditioner,
    BurgersTaskConfig,
    guidance_values,
)

REFERENCE_STEPS_PER_SEC = 40.0  # estimated PyTorch reference (see module docstring)
BATCH = 50  # reference test split size (1D/configs/inference_config.py)
DDIM_STEPS = 200


def main():
    model = UNet2D(dim=128, dim_mults=(1, 2, 4, 8), channels=3,
                   resnet_block_groups=1, compute_dtype=jnp.bfloat16)
    apply_fn = lambda p, x, t: model.apply(p, x, t)
    sched = make_schedule(1000, "cosine")
    dcfg = DiffusionConfig(timesteps=1000, sampling_timesteps=DDIM_STEPS, ddim_eta=1.0)
    tc = BurgersTaskConfig(w_score=500.0)

    rng = jax.random.PRNGKey(0)
    rng, key = jax.random.split(rng)
    shape = (BATCH, 16, 128, 3)
    params = model.init(key, jnp.zeros((1,) + shape[1:]), jnp.zeros((1,), jnp.int32))
    state = jax.random.normal(rng, shape)

    g = jax.grad(lambda x: guidance_values(x, jnp.zeros(()), tc).sum())

    @jax.jit
    def run(params, rng, state):
        cond = BurgersConditioner(u0=state[:, 0, :, 0], uT=state[:, COND_IDX, :, 0])
        return ddim_sample(
            apply_fn, params, sched, dcfg, rng, state.shape,
            cond=cond, guidance_grad=g,
        )

    # compile + warmup
    rng, key = jax.random.split(rng)
    run(params, key, state).block_until_ready()

    reps = 3
    t0 = time.perf_counter()
    for _ in range(reps):
        rng, key = jax.random.split(rng)
        out = run(params, key, state)
    out.block_until_ready()
    elapsed = time.perf_counter() - t0

    steps_per_sec = DDIM_STEPS * reps / elapsed
    print(json.dumps({
        "metric": "guided_denoise_steps_per_sec_chip",
        "value": round(steps_per_sec, 2),
        "unit": "steps/s (batch 50, DDIM 200, UNet2D dim 128 bf16, guidance on)",
        "vs_baseline": round(steps_per_sec / REFERENCE_STEPS_PER_SEC, 2),
    }))


if __name__ == "__main__":
    main()
