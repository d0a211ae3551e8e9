"""Decompose the guided-DDIM step time on the chip (VERDICT r2 item 6).

bench.py measures 95 steps/s = 57.9% MFU; the forward at 100% MXU would be
165 steps/s. Where do the remaining ~4.4 ms/step go? Measures, at the bench
config (UNet2D dim 128 bf16, batch 50, 200 steps):

  A. raw UNet forward x200 (lax.scan over the carried state) — the
     irreducible model time including XLA's conv/attention efficiency;
  B. + DDIM posterior update + conditioning (unguided ddim_sample);
  C. + guidance gradient (full bench step, guided ddim_sample);

A vs speed-of-light = conv/attention MXU efficiency (not recoverable
without changing the model); B-A = sampler elementwise overhead;
C-B = guidance-grad overhead. Writes one JSON line per variant.
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
    COND_IDX, BurgersConditioner, BurgersTaskConfig, guidance_values,
)

BATCH = 50
STEPS = 200
FWD_FLOPS = 1.196615663616e12  # per batch-50 forward (XLA cost analysis)
PEAK = 197e12


def main():
    print("devices:", jax.devices(), flush=True)
    model = UNet2D(dim=128, dim_mults=(1, 2, 4, 8), channels=3,
                   resnet_block_groups=1, compute_dtype=jnp.bfloat16)
    sched = make_schedule(1000, "cosine")
    dcfg = DiffusionConfig(timesteps=1000, sampling_timesteps=STEPS, ddim_eta=1.0)
    tc = BurgersTaskConfig(w_score=500.0)
    g = jax.grad(lambda x: guidance_values(x, jnp.zeros(()), tc).sum())

    rng = jax.random.PRNGKey(0)
    shape = (BATCH, 16, 128, 3)
    params = model.init(rng, jnp.zeros((1,) + shape[1:]), jnp.zeros((1,), jnp.int32))
    state = jax.random.normal(rng, shape)

    @jax.jit
    def fwd_only(params, state):
        # 200 chained forwards: x_{k+1} = f(x_k, t_k); the chain dependency
        # prevents DCE/batch-reordering, matching the sampler's structure
        def body(x, t):
            tb = jnp.full((BATCH,), t, jnp.int32)
            return model.apply(params, x, tb).astype(x.dtype), None

        x, _ = jax.lax.scan(body, state, jnp.arange(STEPS, dtype=jnp.int32))
        return x

    @jax.jit
    def unguided(params, rng, state):
        cond = BurgersConditioner(u0=state[:, 0, :, 0], uT=state[:, COND_IDX, :, 0])
        return ddim_sample(model.apply, params, sched, dcfg, rng, state.shape,
                           cond=cond, guidance_grad=None)

    @jax.jit
    def guided(params, rng, state):
        cond = BurgersConditioner(u0=state[:, 0, :, 0], uT=state[:, COND_IDX, :, 0])
        return ddim_sample(model.apply, params, sched, dcfg, rng, state.shape,
                          cond=cond, guidance_grad=g)

    def timeit(name, fn, *args):
        # sync by fetching a scalar to host: on the tunneled axon backend,
        # block_until_ready alone returned before remote completion for the
        # scan-of-forwards variant (round-3 run recorded 0.002 ms/step)
        float(jnp.sum(fn(*args)))  # compile+warmup
        reps = 3
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(*args)
        float(jnp.sum(out))
        dt = (time.perf_counter() - t0) / reps
        sps = STEPS / dt
        print(json.dumps({
            "variant": name, "sec_per_run": round(dt, 4),
            "steps_per_sec": round(sps, 2),
            "ms_per_step": round(1000 * dt / STEPS, 3),
            "mfu_fwd_only_accounting": round(FWD_FLOPS * sps / PEAK, 4),
        }), flush=True)
        return dt

    a = timeit("A_forward_only_x200", fwd_only, params, state)
    b = timeit("B_unguided_ddim", unguided, params, jax.random.PRNGKey(1), state)
    c = timeit("C_guided_ddim_bench", guided, params, jax.random.PRNGKey(2), state)
    print(json.dumps({
        "speed_of_light_ms_per_step": round(1000 * FWD_FLOPS / PEAK, 3),
        "model_ms": round(1000 * a / STEPS, 3),
        "sampler_overhead_ms": round(1000 * (b - a) / STEPS, 3),
        "guidance_overhead_ms": round(1000 * (c - b) / STEPS, 3),
    }), flush=True)


if __name__ == "__main__":
    main()
