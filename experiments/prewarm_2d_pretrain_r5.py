"""Round-5 gating-compile prewarm for the long 2D pretrain.

The at-scale run (run_2d_refscale_r4.py) trains through
run_train_loop's device-pool multi_gather program — a lax.scan over
steps_per_call train steps gathering micro-batches from a (2500, 32, 64,
64, 7) device pool. That HLO is DIFFERENT from the MFU study's single-step
program, and its remote compile is the gating cost of the main event, so
compile it NOW on fake same-shape data (same HLO: shapes/dtypes are all
that matter) with the expected-winner config while the smoke datagen
still owns most of the chip. Executes only num_steps=steps_per_call
steps (one program call) to trigger compile + cache.

Config must EXACTLY match the long run's invocation:
  batch 7, accum 2, bf16, remat save_heavy, attn packed, conv xla,
  steps_per_call 10, device_pool 2500, pool_refresh_every 2000.
Env overrides: SMOKE_REMAT_POLICY / SMOKE_ATTN_IMPL / SMOKE_CONV_IMPL /
SMOKE_K.
"""
import logging
import os
import time

import numpy as np
import jax

logging.basicConfig(level=logging.INFO)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
t0 = time.time()


def tick(msg):
    print(f"[{time.time()-t0:7.1f}s] {msg}", flush=True)


from safediffcon_tpu.tasks.smoke import SmokeDataset, SmokePretrainConfig, pretrain

K = int(os.environ.get("SMOKE_K", 10))
POLICY = os.environ.get("SMOKE_REMAT_POLICY", "save_heavy")
ATTN = os.environ.get("SMOKE_ATTN_IMPL", "packed")
CONV = os.environ.get("SMOKE_CONV_IMPL", "xla")

tick(f"devices: {jax.devices()}")
# np.zeros is lazy (calloc); pages fault in during device_put at the pool
# refresh — still the cheapest way to materialize 9.2 GB on this host.
fake = np.zeros((2504, 32, 64, 64, 7), np.float32)
data = SmokeDataset(data=fake, raw=fake)

pre = SmokePretrainConfig(batch_size=7, gradient_accumulate_every=2,
                          checkpoint_every=10**9, compute_dtype="bfloat16",
                          remat_policy=POLICY, conv_impl=CONV,
                          attn_impl=ATTN)
tick(f"compiling pretrain chunk: K={K} policy={POLICY} attn={ATTN} conv={CONV}")
pretrain(pre, data, num_steps=K, log_every=K, steps_per_call=K,
         device_pool=2500, pool_refresh_every=2000)
tick("PREWARM_2D_DONE (chunk compiled + executed once)")
