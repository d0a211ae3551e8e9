"""Headline benchmark: guided denoise steps/sec/chip on the flagship 1D config.

Measures the fused guided-DDIM sampler (UNet2D dim 128, batch 50 test set,
200 DDIM steps with safety-guidance gradient — the reproduce-InfFT inference
hot path, reference: 1D/scripts/reproduce_InfFT.sh + 1D/model/diffusion.py:451-555)
and prints ONE JSON line including the measured MFU.

Roofline accounting (measured, see experiments/profile_guided_step.py):
  - UNet2D forward = 23.93 GFLOP/sample (XLA cost analysis, batch 50:
    1.1966e12 FLOP). One forward dominates each guided DDIM step.
  - TPU v5e peak is 197 TFLOP/s bf16, so speed-of-light for this
    model/batch is 197e12 / 1.1966e12 = ~165 steps/s; the measured rate
    divided by that bound is the MFU reported below (~58% as of round 2 —
    sample-throughput is flat from batch 50 to 400, i.e. the chip is
    compute-saturated, not underfilled).

`vs_baseline` compares against the PyTorch reference's host-driven loop on
its original single-GPU setup. The repo publishes no numbers (BASELINE.md),
so the denominator is derived, not guessed:
  - The same 1.2 TFLOP/step at fp16 on an A100 (312 TFLOP/s peak) gives a
    260 steps/s bound; torch eager conv U-Nets driven step-by-step from
    Python (one kernel-launch chain + a guidance autograd re-entry per
    step, reference 1D/model/diffusion.py:480-521) typically sustain
    10-25% utilization => 26-65 steps/s. We use the 40 steps/s midpoint.
  - Cross-check on identical hardware (this host's CPU, single core):
    driving the ACTUAL reference ddim_sample vs our fused sampler measures
    the framework-level gap directly — see
    experiments/bench_reference_torch.py and BASELINE.md for the recorded
    ratio.
"""
import json
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

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

REFERENCE_STEPS_PER_SEC = 40.0  # derived reference estimate (see docstring)
# bf16 peak by device kind (jax.devices()[0].device_kind), not by backend
# name — v4/v6e chips must not silently report v5e MFU.
PEAK_FLOPS_BY_KIND = {
    "TPU v5 lite": 197e12,  # v5e
    "TPU v5e": 197e12,
    "TPU v4": 275e12,
    "TPU v6 lite": 918e12,  # v6e (Trillium)
    "TPU v6e": 918e12,
}
BATCH = 50  # reference test split size (1D/configs/inference_config.py)
DDIM_STEPS = 200
DIM = 128
# One UNet2D dim-128 batch-50 forward, measured via XLA cost analysis
# (experiments/profile_guided_step.py / profile_guided_step_round2.jsonl).
# A constant to keep bench.py to a single compile on this slow host;
# main() asserts the model/batch config still matches it.
FWD_FLOPS_PER_STEP = 1.196615663616e12
FWD_FLOPS_CONFIG = (BATCH, DDIM_STEPS, DIM)
assert FWD_FLOPS_CONFIG == (50, 200, 128), (
    "FWD_FLOPS_PER_STEP was measured for batch 50 / DDIM 200 / dim 128; "
    "re-derive it via jax.jit(...).lower(...).cost_analysis() (see "
    "experiments/profile_guided_step.py) before changing the bench config")


def main():
    model = UNet2D(dim=DIM, dim_mults=(1, 2, 4, 8), channels=3,
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

    fwd_flops = FWD_FLOPS_PER_STEP

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
    sustained_tflops = fwd_flops * steps_per_sec / 1e12
    peak = PEAK_FLOPS_BY_KIND.get(jax.devices()[0].device_kind)
    mfu = sustained_tflops * 1e12 / peak if peak else None
    print(json.dumps({
        "metric": "guided_denoise_steps_per_sec_chip",
        "value": round(steps_per_sec, 2),
        "unit": "steps/s (batch 50, DDIM 200, UNet2D dim 128 bf16, guidance on)",
        "vs_baseline": round(steps_per_sec / REFERENCE_STEPS_PER_SEC, 2),
        "mfu": round(mfu, 4) if mfu is not None else None,
        "sustained_tflops_per_sec": round(sustained_tflops, 1),
        "speed_of_light_steps_per_sec": round(peak / fwd_flops, 1) if peak else None,
        "forward_flops_per_step": fwd_flops,
    }))


if __name__ == "__main__":
    # A faulted TPU worker (round-3 failure mode: "UNAVAILABLE: TPU worker
    # process crashed or restarted") can recover between attempts — retry
    # with a backend re-init so a transient fault doesn't cost the round's
    # perf artifact.
    from safediffcon_tpu.utils.faults import retry_on_device_fault

    retry_on_device_fault(main, retries=2, backoff_s=60.0, describe="bench")
