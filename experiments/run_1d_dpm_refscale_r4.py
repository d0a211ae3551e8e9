"""Round-4 DPM-Solver++ quality-at-refscale validation (VERDICT r3 next #9).

DPM-Solver++(2M) is implemented and unit-tested (core/sampling.py) but no
artifact backs the "DDIM-200 quality in 20-50 steps" claim. This script
loads the round-2 refscale Burgers pretrain (50k steps, durable copy at
artifacts/burgers_pretrain_ckpt-50000) and runs the SAME
calibrate -> guided-evaluate flow with:

    sampler=ddim, 200 steps   (the reference reproduce setting,
                               1D/scripts/reproduce_InfFT.sh)
    sampler=dpm,  50 steps
    sampler=dpm,  20 steps

recording J / R_p / R_t / R_s, Q-hat, and wall-clock per eval. A DPM row
matching DDIM-200 J within noise at 4-10x fewer NFEs is a genuine
beat-the-reference throughput headline (reference has ancestral/DDIM
only, 1D/model/diffusion.py:451-607).
Output: experiments/validation_1d_dpm_round4.json
"""
import json
import logging
import os
import shutil
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


from safediffcon_tpu.tasks.burgers.config import BurgersConformalConfig
from safediffcon_tpu.tasks.burgers.data import (
    BurgersDataset, generate_burgers_dataset,
)
from safediffcon_tpu.tasks.burgers.pipeline import BurgersPipeline
from safediffcon_tpu.utils.checkpoint import load_checkpoint, latest_step

ART = "/root/repo/artifacts"
DATA = os.path.join(ART, "burgers_ref.npz")
CKPT_DIR = "/tmp/b_ref_ckpt"  # milestone layout: <dir>/ckpt-<step>
OUT = "/root/repo/experiments/validation_1d_dpm_round4.json"
N_SEEDS = int(os.environ.get("DPM_EVAL_SEEDS", 3))

tick(f"devices: {jax.devices()}")
if not os.path.exists(DATA):
    generate_burgers_dataset(DATA, n_train=40000, n_cal=1000, n_test=50, seed=0)
if not os.path.exists(os.path.join(CKPT_DIR, "ckpt-50000")):
    os.makedirs(CKPT_DIR, exist_ok=True)
    shutil.copytree(os.path.join(ART, "burgers_pretrain_ckpt-50000"),
                    os.path.join(CKPT_DIR, "ckpt-50000"))
    tick("seeded /tmp checkpoint dir from the durable artifacts copy")

cal = BurgersDataset.load(DATA, "cal")
test = BurgersDataset.load(DATA, "test")
tick(f"splits loaded: cal={len(cal.data)} test={len(test.data)}")

ckpt_dir = CKPT_DIR
step = 50000

results = {}
# ddim-20/50 added after the round-4 CPU diagnosis: stochastic (eta=1)
# few-step DDIM matched/beat DDIM-200 (validation_1d_dpm_cpu_round4.json);
# this full-size run certifies that headline with calibration + 3 seeds.
variants = [("ddim", 200), ("ddim", 20), ("ddim", 50), ("dpm", 50), ("dpm", 20)]
params = None
for sampler, steps in variants:
    conf = BurgersConformalConfig(sampler=sampler, ddim_sampling_steps=steps)
    pipe = BurgersPipeline(conf, dim=128, compute_dtype="bfloat16")
    if params is None:
        # Target-free raw restore: we only need the EMA params; rebuilding
        # the opt_state target requires matching the pretrain config's
        # optimizer chain exactly (adam + grad-clip) — a structure mismatch
        # crashed the round-4 CPU run of this flow before this fix.
        restored = load_checkpoint(ckpt_dir, step)
        params = jax.tree_util.tree_map(jnp.asarray, restored["ema_params"])
        tick(f"restored EMA params at step {int(np.asarray(restored['step']))}")

    key = f"{sampler}{steps}"
    rng = jax.random.PRNGKey(0)
    t_q = time.time()
    Q = pipe.calibrate(params, cal.data, 0.0, rng)
    q_s = time.time() - t_q
    rows, times = [], []
    for s in range(N_SEEDS):
        t_e = time.time()
        m = pipe.evaluate(params, test, Q, jax.random.PRNGKey(5000 + s))
        times.append(time.time() - t_e)
        rows.append({k: float(v) for k, v in m.items()})
        tick(f"{key} seed {s} ({times[-1]:.1f}s): {rows[-1]}")
    agg = {k: {"mean": float(np.mean([r[k] for r in rows])),
               "std": float(np.std([r[k] for r in rows]))}
           for k in rows[0]}
    results[key] = {
        "sampler": sampler, "steps": steps, "Q": float(Q),
        "calibrate_s": q_s, "per_seed": rows, "agg": agg,
        # first eval includes compile; steady-state = later evals
        "eval_s_first": times[0],
        "eval_s_steady": float(np.mean(times[1:])) if len(times) > 1 else None,
    }
    with open(OUT, "w") as f:
        json.dump(results, f, indent=1, sort_keys=True)
    tick(f"{key}: J={agg['control_mse_mean (J)']['mean']:.5f}"
         f"+-{agg['control_mse_mean (J)']['std']:.5f} Q={float(Q):.4f}")

print("SUMMARY", json.dumps({k: v["agg"]["control_mse_mean (J)"]
                             for k, v in results.items()}))
tick(f"done -> {OUT}")
