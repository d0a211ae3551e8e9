"""Round-1 validation: real 1D Burgers run on the TPU chip.
Generates 21k trajectories, pretrains the turbo model 3000 steps,
calibrates, evaluates, then runs a short posttrain. Logs to stdout."""
import time, json
import numpy as np, jax, jax.numpy as jnp

t0 = time.time()
def tick(msg): print(f"[{time.time()-t0:7.1f}s] {msg}", flush=True)

from safediffcon_tpu.tasks.burgers.data import generate_burgers_dataset, BurgersDataset
from safediffcon_tpu.tasks.burgers.config import (
    BurgersConformalConfig, BurgersPostTrainConfig, BurgersPretrainConfig)
from safediffcon_tpu.tasks.burgers import pipeline as P

tick(f"devices: {jax.devices()}")
generate_burgers_dataset("/tmp/burgers_val.npz", n_train=20000, n_cal=1000, n_test=50, seed=0)
tick("dataset generated (21050 trajectories)")

data = {s: BurgersDataset.load("/tmp/burgers_val.npz", s) for s in ("train","cal","test")}
pre = BurgersPretrainConfig(dim=128, batch_size=16, lr=1e-4, checkpoint_every=10**9,
                            compute_dtype="bfloat16")
state = P.pretrain(pre, data["train"], num_steps=3000, log_every=500)
tick("pretrain 3000 steps done")

conf = BurgersConformalConfig(w_score=500.0)
pipe = P.BurgersPipeline(conf, dim=128, compute_dtype="bfloat16")
rng = jax.random.PRNGKey(0)
Q = pipe.calibrate(state.ema_params, data["cal"].data, jnp.zeros(()), rng)
tick(f"Q-hat = {float(Q):.5f}")
m0 = pipe.evaluate(state.ema_params, data["test"], Q, jax.random.PRNGKey(1))
tick(f"eval after pretrain: {json.dumps(m0)}")

pt = BurgersPostTrainConfig(
    conformal=BurgersConformalConfig(w_score=2500.0),
    finetune_epoch=2, finetune_steps=300, finetune_batch_size=64,
    finetune_subset_size=6400, finetune_lr=1e-4)
finetune = BurgersDataset.load("/tmp/burgers_val.npz", "train", subset=6400)
state2, Q2, hist = P.posttrain(pt, pipe, state.ema_params, finetune, data["cal"], data["test"],
                               eval_every_subset_epoch=False)
tick(f"posttrain done, Q={float(Q2):.5f}")
m1 = pipe.evaluate(state2.ema_params, data["test"], Q2, jax.random.PRNGKey(2))
tick(f"eval after posttrain: {json.dumps(m1)}")
print("SUMMARY", json.dumps({"pretrain_eval": m0, "posttrain_eval": m1,
                             "Q_pre": float(Q), "Q_post": float(Q2)}))
