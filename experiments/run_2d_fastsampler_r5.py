"""Round-5 cross-task fast-sampler validation, 2D smoke arm (VERDICT r4
next #4): the reference hardcodes 100 DDIM steps for the 2D posttrain
pipeline (2d/scripts/posttrain.sh). This evaluates the posttrain params at
DDIM-100 (reference) vs stochastic DDIM-20 — calibration re-run per arm
with the deployed sampler — over N_SEEDS eval seeds.

Needs the posttrain phase state from the at-scale run
(artifacts/smoke_pt_state_r4, written by run_2d_refscale_r4.py) and the
raw mmap cache (/tmp/smoke_ref_raw). Output:
experiments/validation_2d_fastsampler_round5.json
"""
import dataclasses
import json
import logging
import os
import time

import numpy as np
import jax
import jax.numpy as jnp

logging.basicConfig(level=logging.INFO)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
t0 = time.time()


def tick(msg):
    print(f"[{time.time()-t0:7.1f}s] {msg}", flush=True)


from safediffcon_tpu.core.train import make_optimizer
from safediffcon_tpu.tasks.smoke import (
    SmokeConformalConfig, SmokeDataset, SmokePipeline,
)
from safediffcon_tpu.tasks.smoke.data import RESCALER
from safediffcon_tpu.tasks.smoke.pipeline import init_params
from safediffcon_tpu.utils.checkpoint import load_phase_state

STATE = os.environ.get("SMOKE_PT_STATE", "/root/repo/artifacts/smoke_pt_state_r4")
RAW_DIR = "/tmp/smoke_ref_raw"
OUT = "/root/repo/experiments/validation_2d_fastsampler_round5.json"
N_SEEDS = int(os.environ.get("SMOKE_EVAL_SEEDS", 3))
ATTN = os.environ.get("SMOKE_ATTN_IMPL", "packed")
ARMS = [("ddim", 100), ("ddim", 20)]


def load_split(split):
    raw = np.asarray(np.load(os.path.join(RAW_DIR, f"{split}_data.npy"),
                             mmap_mode="r"))
    return SmokeDataset(data=(raw / RESCALER).astype(np.float32, copy=False),
                        raw=raw)


tick(f"devices: {jax.devices()}")
cal, test = load_split("cal"), load_split("test")

base = SmokeConformalConfig(alpha=0.04, standard_fixed_ratio=100.0,
                            w_safe=0.9, cal_batch_size=50, num_cal_batch=4,
                            ddim_sampling_steps=100, test_batch_size=25)
pipe0 = SmokePipeline(base, compute_dtype="bfloat16", attn_impl=ATTN,
                      cal_chunk=10, eval_chunk=10)
p0 = init_params(pipe0.model, jax.random.PRNGKey(0))
tx = make_optimizer("adam", 1e-4, betas=(0.9, 0.99), max_grad_norm=0.0)
restored = load_phase_state(STATE, p0, tx.init(p0))
assert restored is not None, f"no phase state in {STATE}"
params = restored[0]
tick(f"posttrain epoch-{restored[3]} params restored, Q={float(restored[2]):.5f}")

results = {"n_seeds": N_SEEDS, "arms": {}}
for sampler, steps in ARMS:
    conf = dataclasses.replace(base, sampler=sampler,
                               ddim_sampling_steps=steps)
    pipe = SmokePipeline(conf, compute_dtype="bfloat16", attn_impl=ATTN,
                         cal_chunk=10, eval_chunk=10)
    Q = pipe.calibrate(params, cal, jnp.zeros(()), jax.random.PRNGKey(0))
    tick(f"{sampler}-{steps}: Q={float(Q):.5f}")
    rows, secs = [], []
    for s in range(N_SEEDS):
        t1 = time.time()
        m = pipe.evaluate(params, test, Q, jax.random.PRNGKey(7000 + s),
                          guided=True)
        rows.append({k: float(v) for k, v in m.items()})
        secs.append(time.time() - t1)
        tick(f"{sampler}-{steps} seed {s} ({secs[-1]:.1f}s): {rows[-1]}")
    agg = {k: {"mean": float(np.mean([r[k] for r in rows])),
               "std": float(np.std([r[k] for r in rows]))}
           for k in rows[0]}
    results["arms"][f"{sampler}-{steps}"] = {
        "Q": float(Q), "nfe": steps, "per_seed": rows, "agg": agg,
        "eval_seconds_warm": float(np.median(secs[1:]) if len(secs) > 1
                                   else secs[0]),
    }
    with open(OUT, "w") as f:
        json.dump(results, f, indent=1, sort_keys=True)
print("SUMMARY " + json.dumps({k: {m: round(v["agg"][m]["mean"], 4)
                                   for m in v["agg"]}
                               for k, v in results["arms"].items()}))
tick("done")
