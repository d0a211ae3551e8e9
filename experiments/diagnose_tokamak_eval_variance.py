"""Quantify eval-seed variance of the tokamak metrics at FIXED params
(VERDICT r2 item 4 diagnosis support).

Round 2's posttrain history showed obj_mse 0.070 (epoch 0) -> 0.172
(epoch 6) -> 0.161 (final) and flagged a possible objective regression.
But the posttrain branch takes ONE optimizer step per epoch at lr 7e-6
(reference: tokamak/scripts/posttrain.sh), and each epoch's eval re-samples
the 50-trajectory test set with fresh DDIM noise — per-sample obj_mse_std
is ~0.14, so the across-seed spread of obj_mse_mean at *unchanged* params
bounds how much of the epoch-to-epoch movement is attributable to training
at all.

This script evaluates the SAME checkpoint with N different eval seeds and
reports the across-seed mean/std/min/max of every metric. Runs on CPU
(JAX_PLATFORMS=cpu) so it does not contend with the chip queue.
"""
import json
import os
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

t0 = time.time()


def tick(msg):
    print(f"[{time.time()-t0:7.1f}s] {msg}", flush=True)


from safediffcon_tpu.tasks.tokamak import TokamakDataset, TokamakPipeline
from safediffcon_tpu.tasks.tokamak.config import posttrain_config
from safediffcon_tpu.utils.checkpoint import load_checkpoint

DATA = "/tmp/tok_ref.npz"
CKPT_DIR = os.environ.get("TOK_CKPT_DIR", "/tmp/tok_ref_ckpt")
CKPT_STEP = int(os.environ.get("TOK_CKPT_STEP", 20_000))
N_SEEDS = int(os.environ.get("N_SEEDS", 5))
# round-2 recorded pretrain quantile (validation_tokamak_refscale_round2.json)
Q = float(os.environ.get("TOK_Q", 0.14177584648132324))
OUT = "/root/repo/experiments/diagnose_tokamak_eval_variance.json"

tick(f"devices: {jax.devices()}")
test = TokamakDataset.load(DATA, "test")
tick(f"test split: {len(test.data)}")

restored = load_checkpoint(CKPT_DIR, CKPT_STEP)
params = restored["ema_params"]
tick(f"checkpoint {CKPT_DIR}/ckpt-{CKPT_STEP} loaded")

cfg = posttrain_config()
pipe = TokamakPipeline(cfg.conformal, dim=128, compute_dtype="bfloat16")

runs = []
for seed in range(N_SEEDS):
    m = pipe.evaluate(params, test, Q, jax.random.PRNGKey(1000 + seed))
    runs.append(m)
    tick(f"seed {seed}: obj_mse={m['obj_mse_mean']:.4f} "
         f"time_below={m['time_below_ratio']:.4f} "
         f"sample_below={m['sample_below_ratio']:.3f}")

keys = sorted(runs[0])
summary = {}
for k in keys:
    vals = np.array([r[k] for r in runs])
    summary[k] = {"mean": float(vals.mean()), "std": float(vals.std()),
                  "min": float(vals.min()), "max": float(vals.max())}

out = {"checkpoint": f"{CKPT_DIR}/ckpt-{CKPT_STEP}", "Q": Q,
       "n_seeds": N_SEEDS, "per_seed": runs, "across_seed": summary}
with open(OUT, "w") as f:
    json.dump(out, f, indent=1, sort_keys=True)
print("SUMMARY", json.dumps({k: summary[k] for k in
                             ("obj_mse_mean", "time_below_ratio",
                              "sample_below_ratio", "safety_score_mean")}))
tick(f"done -> {OUT}")
