"""Round-5 cross-task fast-sampler validation, tokamak arm (VERDICT r4
next #4): the reference hardcodes 200 DDIM steps for tokamak posttrain
evaluation (tokamak/scripts/posttrain.sh; tokamak/configs). The round-4 1D
finding — stochastic (eta=1) DDIM at 20-50 steps matches DDIM-200 quality
— is certified here on the tokamak task at full reference scale (200k
pretrain, full 1000-sample calibration, 50-sample test).

For each sampler arm, calibration uses the SAME sampler as evaluation
(the conformal quantile must be computed under the deployed sampler), and
the evaluation is repeated over N_SEEDS eval seeds for error bars.

Needs /tmp/tok_ref_ckpt/ckpt-200000 (restore_tokamak_artifacts_r5.py) and
artifacts/tok_ref.npz. Output:
experiments/validation_tokamak_fastsampler_round5.json
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


from safediffcon_tpu.tasks.tokamak import TokamakDataset, TokamakPipeline
from safediffcon_tpu.tasks.tokamak.config import posttrain_config
from safediffcon_tpu.utils.checkpoint import load_checkpoint

ART = "/root/repo/artifacts"
DATA = os.path.join(ART, "tok_ref.npz")
CKPT = "/tmp/tok_ref_ckpt"
OUT = "/root/repo/experiments/validation_tokamak_fastsampler_round5.json"
N_SEEDS = int(os.environ.get("TOK_EVAL_SEEDS", 3))
ARMS = [("ddim", 200), ("ddim", 50), ("ddim", 20), ("dpm", 50), ("dpm", 20)]

tick(f"devices: {jax.devices()}")
data = {s: TokamakDataset.load(DATA, s) for s in ("cal", "test")}
restored = load_checkpoint(CKPT, 200_000)
params = restored.get("ema_params", restored.get("params"))
tick("200k EMA params restored")

base = posttrain_config().conformal
results = {"n_seeds": N_SEEDS, "arms": {}}
for sampler, steps in ARMS:
    conf = dataclasses.replace(base, sampler=sampler,
                               ddim_sampling_steps=steps)
    pipe = TokamakPipeline(conf, dim=128, compute_dtype="bfloat16")
    rng = jax.random.PRNGKey(0)
    Q = pipe.calibrate(params, data["cal"], jnp.zeros(()), rng)
    tick(f"{sampler}-{steps}: Q={float(Q):.5f}")
    rows, secs = [], []
    for s in range(N_SEEDS):
        t1 = time.time()
        m = pipe.evaluate(params, data["test"], Q, jax.random.PRNGKey(9000 + s))
        rows.append({k: float(v) for k, v in m.items()})
        secs.append(time.time() - t1)
        tick(f"{sampler}-{steps} seed {s} ({secs[-1]:.1f}s): {rows[-1]}")
    agg = {k: {"mean": float(np.mean([r[k] for r in rows])),
               "std": float(np.std([r[k] for r in rows]))}
           for k in rows[0]}
    # first seed pays any residual compile; report the warm median
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
