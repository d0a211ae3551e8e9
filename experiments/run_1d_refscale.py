"""Reference-scale 1D Burgers run (round 3): full 200k-step pretrain (the
reference's training length, 1D/configs/train_config.py:69-77) made
affordable by chunked device-resident stepping, then post-training and
InfFT at the reproduce hyperparameters (BASELINE.md):
  posttrain: lr 1e-4, 5 epochs x 3200 steps, batch 32, subset 10240,
             w_score 2500 (1D/scripts/base_posttrain.sh)
  InfFT:     DDIM 200 eta=1, alpha=.98, w_score 500, lr 1e-5, 3 iters
             (1D/scripts/reproduce_InfFT.sh)
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


from safediffcon_tpu.tasks.burgers.data import generate_burgers_dataset, BurgersDataset
from safediffcon_tpu.tasks.burgers.config import (
    BurgersConformalConfig, BurgersInfFTConfig, BurgersPostTrainConfig,
    BurgersPretrainConfig,
)
from safediffcon_tpu.tasks.burgers import pipeline as P

DATA = "/tmp/burgers_ref.npz"
CKPT_DIR = "/tmp/b_ref_ckpt"
PRETRAIN_STEPS = int(os.environ.get("B_PRETRAIN_STEPS", 200_000))
PT_EPOCHS = int(os.environ.get("B_PT_EPOCHS", 5))
PT_STEPS = int(os.environ.get("B_PT_STEPS", 3200))

tick(f"devices: {jax.devices()}")
if not os.path.exists(DATA):
    generate_burgers_dataset(DATA, n_train=40000, n_cal=1000, n_test=50, seed=0)
    tick("dataset generated (41050)")
else:
    tick("dataset already on disk")
data = {s: BurgersDataset.load(DATA, s) for s in ("train", "cal", "test")}

pre = BurgersPretrainConfig(dim=128, batch_size=16, lr=1e-5,
                            checkpoint_every=50_000, compute_dtype="bfloat16")
state = P.pretrain(pre, data["train"], num_steps=PRETRAIN_STEPS, log_every=2000,
                   checkpoint_dir=CKPT_DIR, resume_dir=CKPT_DIR,
                   steps_per_call=50)
tick(f"pretrain {PRETRAIN_STEPS} steps done")

results = {"pretrain_steps": PRETRAIN_STEPS}

conf = BurgersConformalConfig(w_score=500.0)
pipe = P.BurgersPipeline(conf, dim=128, compute_dtype="bfloat16")
rng = jax.random.PRNGKey(0)
Q = pipe.calibrate(state.ema_params, data["cal"].data, jnp.zeros(()), rng)
m0 = pipe.evaluate(state.ema_params, data["test"], Q, jax.random.PRNGKey(1))
tick(f"pretrain eval: Q={float(Q):.4f} {json.dumps(m0)}")
results["pretrain_eval"], results["Q_pretrain"] = m0, float(Q)

pt = BurgersPostTrainConfig(
    conformal=BurgersConformalConfig(w_score=2500.0),
    finetune_epoch=PT_EPOCHS, finetune_steps=PT_STEPS, finetune_batch_size=32,
    finetune_subset_size=10240, finetune_lr=1e-4, steps_per_call=25)
ft = BurgersDataset.load(DATA, "train", subset=10240)
state2, Q2, hist = P.posttrain(pt, pipe, state.ema_params, ft, data["cal"],
                               data["test"], eval_every_subset_epoch=False)
m1 = pipe.evaluate(state2.ema_params, data["test"], Q2, jax.random.PRNGKey(2))
tick(f"posttrain eval: Q={float(Q2):.4f} {json.dumps(m1)}")
results["posttrain_eval"], results["Q_posttrain"] = m1, float(Q2)

cfg = BurgersInfFTConfig(InfFT_iters=3, finetune_lr=1e-5)
state3, Q3, hist3 = P.inference_finetune(cfg, pipe, state2.ema_params,
                                         data["cal"], data["test"])
m2 = pipe.evaluate(state3.ema_params, data["test"], Q3, jax.random.PRNGKey(3))
tick(f"posttrain+InfFT eval: Q={float(Q3):.4f} {json.dumps(m2)}")
results["infft_eval"], results["Q_infft"] = m2, float(Q3)

print("SUMMARY", json.dumps(results))
out = os.environ.get("B_OUT", "/root/repo/experiments/validation_1d_refscale_round3.json")
with open(out, "w") as f:
    json.dump(results, f, indent=1, sort_keys=True)
tick("done")
