"""Reference-scale tokamak demonstration (round 3: full-length pretrain,
VERDICT r2 items 3+4 — the posttrain objective regression is re-diagnosed
from a reference-length pretrain).

Reference-scale dataset (48,950 train / 1,000 cal / 50 test closed-loop
trajectories, matching tokamak/data/tokamak_dataset.py:11-16 split sizes),
a long bf16 pretrain, then post-training and backward finetune at the
reference reproduce hyperparameters (BASELINE.md):
  posttrain: DDIM 200, alpha=.9, guidance_scaler 5, 8 epochs x 1 step,
             lr 7e-6, cal 1000x1 (tokamak/scripts/posttrain.sh)
  finetune:  DDIM 250, lr 9e-6, scaler .01, alpha=.9, backward, 5 epochs
             (tokamak/scripts/finetune.sh)
"""
import json
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


from safediffcon_tpu.tasks.tokamak import (
    TokamakDataset, TokamakPipeline, TokamakPretrainConfig,
    generate_tokamak_dataset, pretrain, run_inference,
)
from safediffcon_tpu.tasks.tokamak.config import (
    finetune_config, posttrain_config,
)

DATA = "/tmp/tok_ref.npz"
CKPT_DIR = "/tmp/tok_ref_ckpt"
PRETRAIN_STEPS = int(os.environ.get("TOK_PRETRAIN_STEPS", 200_000))

tick(f"devices: {jax.devices()}")
if not os.path.exists(DATA):
    generate_tokamak_dataset(DATA, n_train=48950, n_cal=1000, n_test=50,
                             gen_batch=512)
    tick("dataset generated (48950/1000/50 closed-loop trajectories)")
else:
    tick("dataset already on disk")

data = {s: TokamakDataset.load(DATA, s) for s in ("train", "cal", "test")}
tick(f"splits loaded: train={len(data['train'].data)} cal={len(data['cal'].data)} "
     f"test={len(data['test'].data)}")

# checkpoint_every 25k: orbax saves of the dim-128 state block ~50 s each
pre = TokamakPretrainConfig(dim=128, batch_size=32, checkpoint_every=25_000,
                            compute_dtype="bfloat16")
state = pretrain(pre, data["train"], num_steps=PRETRAIN_STEPS, log_every=1000,
                 checkpoint_dir=CKPT_DIR, resume_dir=CKPT_DIR,
                 steps_per_call=50)  # amortize tunnel dispatch latency
tick(f"pretrain {PRETRAIN_STEPS} steps done")

results = {"pretrain_steps": PRETRAIN_STEPS}

# --- post-training at reference hyperparameters ---
pt_cfg = posttrain_config()
pipe = TokamakPipeline(pt_cfg.conformal, dim=128, compute_dtype="bfloat16")
rng = jax.random.PRNGKey(0)
Q0 = pipe.calibrate(state.ema_params, data["cal"], jnp.zeros(()), rng)
m0 = pipe.evaluate(state.ema_params, data["test"], Q0, jax.random.PRNGKey(1))
tick(f"pretrain eval: Q={float(Q0):.4f} {json.dumps(m0)}")
results["pretrain_eval"] = m0
results["Q_pretrain"] = float(Q0)

params_pt, Q_pt, hist_pt = run_inference(
    pt_cfg, pipe, state.ema_params, data["train"], data["cal"], data["test"])
tick(f"posttrain done: Q={float(Q_pt):.4f}")
results["posttrain_history"] = hist_pt
results["posttrain_eval"] = hist_pt[-1]["eval"]
results["Q_posttrain"] = float(Q_pt)

# --- backward finetune from the posttrained params (reference flow:
# posttrain checkpoint -> finetune.sh) ---
ft_cfg = finetune_config()
import dataclasses
ft_cfg = dataclasses.replace(
    ft_cfg,
    conformal=dataclasses.replace(
        ft_cfg.conformal, wo_post_train=False,
        finetune_quantile=float(Q_pt),
        finetune_w_obj=pt_cfg.conformal.w_obj,
        finetune_w_safe=pt_cfg.conformal.w_safe,
        # the posttrain checkpoint's guidance_scaler rides into the test-mode
        # composite weight factor (reference: tokamak/utils/common.py:148-154)
        finetune_guidance_scaler=pt_cfg.conformal.guidance_scaler,
        finetune_set="test",
    ),
)
pipe_ft = TokamakPipeline(ft_cfg.conformal, dim=128, compute_dtype="bfloat16")
params_ft, Q_ft, hist_ft = run_inference(
    ft_cfg, pipe_ft, params_pt, data["train"], data["cal"], data["test"])
tick(f"backward finetune done: Q={float(Q_ft):.4f}")
results["finetune_history"] = hist_ft
results["finetune_eval"] = hist_ft[-1]["eval"]
results["Q_finetune"] = float(Q_ft)

print("SUMMARY", json.dumps(results))
tag = os.environ.get("TOK_TAG", "")
out = f"/root/repo/experiments/validation_tokamak_refscale{tag}_round3.json"
with open(out, "w") as f:
    json.dump(results, f, indent=1, sort_keys=True)
tick(f"done -> {out}")
