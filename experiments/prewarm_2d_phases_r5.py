"""Round-5 off-chip compile prewarm for the 2D posttrain/backward phases.

The refscale run's heavy inference programs — calibration sampling
(DDIM-100 UNet3D scan, chunk 10) and fused evaluate (sampling + 256-step
solver rollout + metrics) — are jit attributes on SmokePipeline, so they
can be lowered with jax.eval_shape-style abstract arguments and compiled
on the remote service WITHOUT touching the chip or allocating HBM. Run
this while the datagen/pretrain own the executor so the long run's
posttrain and backward phases start with a hot persistent cache.

Covers both phase configurations of run_2d_refscale_r4.py:
  posttrain conf: alpha .04, ratio 100, w_safe .9, cal 50x4, DDIM 100,
                  test 25, guided eval, chunk 10
  backward  conf: alpha .01, ratio 495, w_safe 1.0, cal 40x1, DDIM 100,
                  test 5 (finetune_set=test), unguided eval, chunk 10/5
"""
import logging
import os
import time

import jax
import jax.numpy as jnp

logging.basicConfig(level=logging.INFO)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
t0 = time.time()


def tick(msg):
    print(f"[{time.time()-t0:7.1f}s] {msg}", flush=True)


from safediffcon_tpu.tasks.smoke import SmokeConformalConfig, SmokePipeline
from safediffcon_tpu.tasks.smoke.pipeline import init_params

ATTN = os.environ.get("SMOKE_ATTN_IMPL", "packed")
F, S, CH = 32, 64, 7


def abstract(tree):
    return jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(jnp.shape(x), jnp.result_type(x)), tree)


def prewarm_pipe(tag, conf, finetune_set, cal_chunk, eval_chunks, guided):
    pipe = SmokePipeline(conf, compute_dtype="bfloat16", attn_impl=ATTN,
                         finetune_set=finetune_set, cal_chunk=cal_chunk,
                         eval_chunk=10)
    params = abstract(init_params(pipe.model, jax.random.PRNGKey(0)))
    rng = abstract(jax.random.PRNGKey(0))  # matches the callers' key impl
    Q = jax.ShapeDtypeStruct((), jnp.float32)

    state = jax.ShapeDtypeStruct((cal_chunk, F, S, S, CH), jnp.float32)
    t1 = time.time()
    pipe._cal_batch.lower(params, rng, state, Q).compile()
    tick(f"{tag}: _cal_batch chunk={cal_chunk} compiled in {time.time()-t1:.0f}s")

    for ec in eval_chunks:
        raw = jax.ShapeDtypeStruct((ec, F, S, S, CH), jnp.float32)
        t1 = time.time()
        pipe._evaluate.lower(params, rng, raw, Q, guided=guided).compile()
        tick(f"{tag}: _evaluate chunk={ec} guided={guided} compiled "
             f"in {time.time()-t1:.0f}s")


if __name__ == "__main__":
    # SMOKE_DDIM_STEPS=20 prewarms the fast-sampler arm's programs
    # (run_2d_fastsampler_r5.py) instead of the reference-100 ones
    ddim = int(os.environ.get("SMOKE_DDIM_STEPS", 100))
    pt = SmokeConformalConfig(alpha=0.04, standard_fixed_ratio=100.0,
                              w_safe=0.9, cal_batch_size=50, num_cal_batch=4,
                              ddim_sampling_steps=ddim, test_batch_size=25)
    bw = SmokeConformalConfig(alpha=0.01, standard_fixed_ratio=495.0,
                              w_safe=1.0, cal_batch_size=40, num_cal_batch=1,
                              ddim_sampling_steps=ddim, use_guidance=False,
                              test_batch_size=5)
    try:
        # guided eval also covers the unguided baseline eval's shapes only
        # when guided matches, so compile both variants we will run
        prewarm_pipe("posttrain", pt, "train", 10, (10,), guided=True)
        if ddim != 100:
            raise SystemExit(0)  # fast-sampler arm needs only the pt pair
        prewarm_pipe("posttrain-baseline", pt, "train", 10, (10,), guided=False)
        # the test split is 50, so eval chunks are size 10 in every phase
        prewarm_pipe("backward", bw, "test", 10, (10,), guided=False)
        # isolation P1: the round-3 2/2 crasher is the chunk-20 calibration
        prewarm_pipe("isolation-P1", bw, "test", 20, (), guided=False)
    except Exception as e:  # noqa: BLE001
        tick(f"PREWARM FAILED: {str(e)[:300]}")
        raise
    tick("PREWARM_PHASES_DONE")
