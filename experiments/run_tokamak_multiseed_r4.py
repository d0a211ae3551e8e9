"""Round-4 tokamak headline numbers with error bars (VERDICT r3 next #5).

Round-3's refscale claims (obj_mse 0.0407 -> 0.0033 -> 0.0025,
time_below 0.229 -> 0.181) ride single-seed evals while the measured
eval-seed spread is ~0.10-0.16 on the safety ratios
(experiments/diagnose_tokamak_eval_variance.json). This script replays
the reference flow from the persisted 200k pretrain (durable copy at
artifacts/tokamak_pretrain_ckpt-200000) — posttrain (posttrain.sh,
8 epochs x 1 step: cheap) and backward finetune (finetune.sh, 5 epochs)
— then evaluates EVERY phase's params over N_SEEDS eval seeds and
reports mean +- std per metric.

Reference metrics: tokamak/utils/metrics.py:101-142.
Output: experiments/validation_tokamak_multiseed_round4.json
"""
import dataclasses
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


from safediffcon_tpu.tasks.tokamak import (
    TokamakDataset, TokamakPipeline, TokamakPretrainConfig,
    generate_tokamak_dataset, pretrain, run_inference,
)
from safediffcon_tpu.tasks.tokamak.config import (
    finetune_config, posttrain_config,
)

ART = "/root/repo/artifacts"
DATA = os.path.join(ART, "tok_ref.npz")
CKPT_DIR = "/tmp/tok_ref_ckpt"
OUT = "/root/repo/experiments/validation_tokamak_multiseed_round4.json"
N_SEEDS = int(os.environ.get("TOK_EVAL_SEEDS", 5))

tick(f"devices: {jax.devices()}")
if not os.path.exists(DATA):
    generate_tokamak_dataset(DATA, n_train=48950, n_cal=1000, n_test=50,
                             gen_batch=512)
if not os.path.exists(os.path.join(CKPT_DIR, "ckpt-200000")):
    os.makedirs(CKPT_DIR, exist_ok=True)
    shutil.copytree(os.path.join(ART, "tokamak_pretrain_ckpt-200000"),
                    os.path.join(CKPT_DIR, "ckpt-200000"))
    tick("seeded /tmp checkpoint dir from the durable artifacts copy")

data = {s: TokamakDataset.load(DATA, s) for s in ("train", "cal", "test")}
tick(f"splits loaded: train={len(data['train'].data)}")

pre = TokamakPretrainConfig(dim=128, batch_size=32, checkpoint_every=25_000,
                            compute_dtype="bfloat16")
state = pretrain(pre, data["train"], num_steps=200_000, log_every=1000,
                 checkpoint_dir=CKPT_DIR, resume_dir=CKPT_DIR,
                 steps_per_call=50)
tick("pretrain state restored (200k)")

results = {"n_seeds": N_SEEDS}


def seeded_eval(pipe, params, Q, tag):
    rows = []
    for s in range(N_SEEDS):
        m = pipe.evaluate(params, data["test"], Q,
                          jax.random.PRNGKey(9000 + s))
        rows.append({k: float(v) for k, v in m.items()})
        tick(f"{tag} seed {s}: {rows[-1]}")
    agg = {k: {"mean": float(np.mean([r[k] for r in rows])),
               "std": float(np.std([r[k] for r in rows]))}
           for k in rows[0]}
    results[tag] = {"per_seed": rows, "agg": agg, "Q": float(Q)}
    with open(OUT, "w") as f:
        json.dump(results, f, indent=1, sort_keys=True)
    tick(f"{tag} agg: { {k: (round(v['mean'],4), round(v['std'],4)) for k, v in agg.items()} }")
    return agg


# --- pretrain baseline ---
pt_cfg = posttrain_config()
pipe = TokamakPipeline(pt_cfg.conformal, dim=128, compute_dtype="bfloat16")
Q0 = pipe.calibrate(state.ema_params, data["cal"], jnp.zeros(()),
                    jax.random.PRNGKey(0))
seeded_eval(pipe, state.ema_params, Q0, "pretrain")

# --- posttrain (posttrain.sh) ---
params_pt, Q_pt, hist_pt = run_inference(
    pt_cfg, pipe, state.ema_params, data["train"], data["cal"], data["test"])
results["posttrain_history"] = hist_pt
seeded_eval(pipe, params_pt, Q_pt, "posttrain")

# --- backward finetune (finetune.sh) ---
ft_cfg = finetune_config()
ft_cfg = dataclasses.replace(
    ft_cfg,
    conformal=dataclasses.replace(
        ft_cfg.conformal, wo_post_train=False,
        finetune_quantile=float(Q_pt),
        finetune_w_obj=pt_cfg.conformal.w_obj,
        finetune_w_safe=pt_cfg.conformal.w_safe,
        finetune_guidance_scaler=pt_cfg.conformal.guidance_scaler,
        finetune_set="test",
    ),
)
pipe_ft = TokamakPipeline(ft_cfg.conformal, dim=128, compute_dtype="bfloat16")
params_ft, Q_ft, hist_ft = run_inference(
    ft_cfg, pipe_ft, params_pt, data["train"], data["cal"], data["test"])
results["finetune_history"] = hist_ft
seeded_eval(pipe_ft, params_ft, Q_ft, "finetune")

print("SUMMARY", json.dumps({k: v["agg"] if isinstance(v, dict) and "agg" in v
                             else v for k, v in results.items()
                             if k.endswith(("train", "tune"))}, default=str))
with open(OUT, "w") as f:
    json.dump(results, f, indent=1, sort_keys=True)
tick(f"done -> {OUT}")
