"""Round-4 DPM-Solver++ quality validation, CPU-reduced (VERDICT r3 #9).

The full-size chip version is experiments/run_1d_dpm_refscale_r4.py (queued
for when the TPU backend returns — experiments/TPU_OUTAGE_r4.md). QUALITY
numbers, unlike throughput, are platform-independent: the guided-sample ->
solver-J flow computes the same values on CPU, just slowly. So this reduced
run (16 test trajectories, fp32, Q=0 so no calibration pass; the J column
is the quality headline) backs the "DPM-20/50 ~= DDIM-200 quality" claim
with a real artifact on the round-2 refscale 50k-step Burgers pretrain
(durable copy artifacts/burgers_pretrain_ckpt-50000).

Reference sampler being matched: 1D/model/diffusion.py:451-607 (the
reference has ancestral/DDIM only — a quality-parity DPM row at 4-10x
fewer NFEs is a beat-the-reference sampling-cost headline).
Output: experiments/validation_1d_dpm_cpu_round4.json
"""
import json
import logging
import os
import shutil
import time

import numpy as np

os.environ.setdefault("XLA_FLAGS", "")
import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp  # noqa: E402

logging.basicConfig(level=logging.INFO)
t0 = time.time()


def tick(msg):
    print(f"[{time.time()-t0:7.1f}s] {msg}", flush=True)


from safediffcon_tpu.tasks.burgers.config import BurgersConformalConfig
from safediffcon_tpu.tasks.burgers.data import BurgersDataset
from safediffcon_tpu.tasks.burgers.pipeline import BurgersPipeline
from safediffcon_tpu.utils.checkpoint import load_checkpoint

ART = "/root/repo/artifacts"
DATA = os.path.join(ART, "burgers_ref.npz")
CKPT_DIR = "/tmp/b_ref_ckpt"
OUT = "/root/repo/experiments/validation_1d_dpm_cpu_round4.json"
N_TEST = int(os.environ.get("DPM_CPU_N_TEST", 16))

tick(f"devices: {jax.devices()}")
if not os.path.exists(os.path.join(CKPT_DIR, "ckpt-50000")):
    os.makedirs(CKPT_DIR, exist_ok=True)
    shutil.copytree(os.path.join(ART, "burgers_pretrain_ckpt-50000"),
                    os.path.join(CKPT_DIR, "ckpt-50000"))
    tick("seeded /tmp checkpoint dir from the durable artifacts copy")

test = BurgersDataset.load(DATA, "test", subset=N_TEST)
tick(f"test split loaded: {len(test.data)} trajectories")

results = {"platform": "cpu", "n_test": N_TEST, "Q": 0.0,
           "note": ("reduced CPU run during the round-4 TPU outage; "
                    "full-size chip version: run_1d_dpm_refscale_r4.py")}
if os.path.exists(OUT):
    with open(OUT) as f:
        results.update(json.load(f))

variants = [("dpm", 20), ("dpm", 50), ("ddim", 200)]
params = None
for sampler, steps in variants:
    key = f"{sampler}{steps}"
    if key in results:
        tick(f"{key}: already recorded, skipping")
        continue
    conf = BurgersConformalConfig(sampler=sampler, ddim_sampling_steps=steps)
    pipe = BurgersPipeline(conf, dim=128)  # fp32: CPU bf16 is emulated/slower
    if params is None:
        # Target-free raw restore: we only need the EMA params, and the
        # saved opt_state chain (adam + grad-clip from the pretrain config)
        # need not be reconstructed just to be discarded.
        restored = load_checkpoint(CKPT_DIR, 50000)
        params = jax.tree_util.tree_map(jnp.asarray, restored["ema_params"])
        tick(f"restored EMA params at step {int(np.asarray(restored['step']))}")
    t_e = time.time()
    m = pipe.evaluate(params, test, jnp.zeros(()), jax.random.PRNGKey(5000))
    dt = time.time() - t_e
    results[key] = {"sampler": sampler, "steps": steps,
                    "metrics": {k: float(v) for k, v in m.items()},
                    "eval_s_cpu_incl_compile": dt}
    with open(OUT, "w") as f:
        json.dump(results, f, indent=1, sort_keys=True)
    tick(f"{key} ({dt:.0f}s): {results[key]['metrics']}")

print("SUMMARY", json.dumps(
    {k: v["metrics"].get("control_mse_mean (J)") for k, v in results.items()
     if isinstance(v, dict) and "metrics" in v}))
tick(f"done -> {OUT}")
