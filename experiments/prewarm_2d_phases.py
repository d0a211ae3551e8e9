"""AOT-prewarm the 2D posttrain/backward phase programs into the persistent
compilation cache while the pretrain still occupies the chip.

The axon remote-compile service is a separate resource from the chip: the
running pretrain only EXECUTES its (already compiled) step, so compiling
the posttrain-phase programs now is free parallelism — each UNet3D DDIM-100
program otherwise costs ~20-40 min of serial wall-clock after the relaunch.

Uses `make_finetune_steps` / the pipeline's jitted members — the exact
production callables — and `jit(...).lower(shapes).compile()`, which writes
/tmp/jax_cache entries keyed by the same HLO the run will produce.
"""
import logging
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

logging.basicConfig(level=logging.INFO)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
t0 = time.time()


def tick(msg):
    print(f"[{time.time()-t0:7.1f}s] {msg}", flush=True)


from safediffcon_tpu.tasks.smoke import (
    SmokeConformalConfig, SmokeInferenceConfig, SmokePipeline,
)
from safediffcon_tpu.tasks.smoke.pipeline import (
    init_params, make_finetune_steps,
)

S = jax.ShapeDtypeStruct
REC = (32, 64, 64, 7)
POOL = 2500
BATCH = 7
CAL_CHUNK = 25
# eval is chunked (SmokePipeline.eval_chunk): the whole-test-set program
# needs 24 GB HBM (the 64^2 temporal attention materializes f32 scores) on
# a 15.75 GB chip — measured by this script's own AOT compile in round 3
EVAL_CHUNK = 10

tick(f"devices: {jax.devices()}")

# --- exactly the run_2d_refscale_r3.py phase configs ---
conf = SmokeConformalConfig(alpha=0.04, standard_fixed_ratio=100.0,
                            w_safe=0.9, cal_batch_size=50, num_cal_batch=4,
                            ddim_sampling_steps=100, test_batch_size=25)
pipe = SmokePipeline(conf, compute_dtype="bfloat16", cal_chunk=25,
                     eval_chunk=EVAL_CHUNK)
cfg = SmokeInferenceConfig(conformal=conf, finetune_epoch=3,
                           finetune_steps=1000, finetune_batch_size=7,
                           finetune_lr=1e-4, device_pool=POOL)

# finetune.sh: cal 40x1 (NOT the posttrain 50x4); backward batch is memory
# bound — the step needs ~1.6 GB/sample (39.9 GB at B=25, AOT-measured)
BW_BATCH = 5
bconf = SmokeConformalConfig(alpha=0.01, standard_fixed_ratio=495.0,
                             w_safe=1.0, cal_batch_size=40, num_cal_batch=1,
                             ddim_sampling_steps=100, use_guidance=False,
                             test_batch_size=BW_BATCH)
pipe_b = SmokePipeline(bconf, compute_dtype="bfloat16", finetune_set="test",
                       cal_chunk=20, eval_chunk=EVAL_CHUNK)
bcfg = SmokeInferenceConfig(conformal=bconf, backward_finetune=True,
                            finetune_epoch=2, finetune_steps=1)

params_s = jax.eval_shape(lambda k: init_params(pipe.model, k),
                          jax.random.PRNGKey(0))
key_s = jax.eval_shape(lambda: jax.random.PRNGKey(0))
q_s = S((), jnp.float32)

tx, w_step, w_step_pool, _ = make_finetune_steps(cfg, pipe)
_, _, _, b_step = make_finetune_steps(bcfg, pipe_b)
opt_s = jax.eval_shape(tx.init, params_s)


def warm(name, jitted, *args, **kw):
    t = time.time()
    try:
        jitted.lower(*args, **kw).compile()
    except Exception as e:  # keep warming the rest (e.g. HBM-OOM probe shapes)
        tick(f"{name}: FAILED after {time.time()-t:.0f}s: {str(e)[:200]}")
        return False
    tick(f"{name}: compiled in {time.time()-t:.0f}s")
    return True


# use-order of the relaunched run
warm("weighted_step_pool(7 of 2500)", w_step_pool,
     params_s, opt_s, key_s, S((BATCH,), jnp.int32),
     S((POOL,) + REC, jnp.bfloat16), S((POOL,), jnp.float32))
warm("posttrain cal_batch(25)", pipe._cal_batch,
     params_s, key_s, S((CAL_CHUNK,) + REC, jnp.float32), q_s)
warm(f"posttrain evaluate({EVAL_CHUNK}, guided)", pipe._evaluate,
     params_s, key_s, S((EVAL_CHUNK,) + REC, jnp.float32), q_s, guided=True)
warm(f"backward_step({BW_BATCH})", b_step,
     params_s, opt_s, key_s, S((BW_BATCH,) + REC, jnp.float32), q_s)
warm("backward cal_batch(20)", pipe_b._cal_batch,
     params_s, key_s, S((20,) + REC, jnp.float32), q_s)
warm(f"backward evaluate({EVAL_CHUNK}, unguided)", pipe_b._evaluate,
     params_s, key_s, S((EVAL_CHUNK,) + REC, jnp.float32), q_s, guided=False)

tick("all phase programs prewarmed")
