"""Round-1 extended 1D run: 20k pretrain steps, then posttrain and InfFT,
for closer-to-converged quality metrics."""
import time, json
import numpy as np, jax, jax.numpy as jnp

t0 = time.time()
def tick(msg): print(f"[{time.time()-t0:7.1f}s] {msg}", flush=True)

from safediffcon_tpu.tasks.burgers.data import generate_burgers_dataset, BurgersDataset
from safediffcon_tpu.tasks.burgers.config import (
    BurgersConformalConfig, BurgersInfFTConfig, BurgersPostTrainConfig,
    BurgersPretrainConfig)
from safediffcon_tpu.tasks.burgers import pipeline as P
from safediffcon_tpu.utils.checkpoint import save_checkpoint

tick(f"devices: {jax.devices()}")
generate_burgers_dataset("/tmp/burgers_long.npz", n_train=40000, n_cal=1000, n_test=50, seed=0)
tick("dataset generated (41050)")
data = {s: BurgersDataset.load("/tmp/burgers_long.npz", s) for s in ("train","cal","test")}

pre = BurgersPretrainConfig(dim=128, batch_size=32, lr=1e-4, checkpoint_every=10_000,
                            compute_dtype="bfloat16")
state = P.pretrain(pre, data["train"], num_steps=20000, log_every=1000,
                   checkpoint_dir="/tmp/b_long_ckpt")
tick("pretrain 20000 steps done")

conf = BurgersConformalConfig(w_score=500.0)
pipe = P.BurgersPipeline(conf, dim=128, compute_dtype="bfloat16")
rng = jax.random.PRNGKey(0)
Q = pipe.calibrate(state.ema_params, data["cal"].data, jnp.zeros(()), rng)
m0 = pipe.evaluate(state.ema_params, data["test"], Q, jax.random.PRNGKey(1))
tick(f"pretrain eval: Q={float(Q):.4f} {json.dumps(m0)}")

pt = BurgersPostTrainConfig(
    conformal=BurgersConformalConfig(w_score=2500.0),
    finetune_epoch=3, finetune_steps=400, finetune_batch_size=64,
    finetune_subset_size=10240, finetune_lr=1e-4)
ft = BurgersDataset.load("/tmp/burgers_long.npz", "train", subset=10240)
state2, Q2, hist = P.posttrain(pt, pipe, state.ema_params, ft, data["cal"], data["test"],
                               eval_every_subset_epoch=False)
m1 = pipe.evaluate(state2.ema_params, data["test"], Q2, jax.random.PRNGKey(2))
tick(f"posttrain eval: Q={float(Q2):.4f} {json.dumps(m1)}")

cfg = BurgersInfFTConfig(InfFT_iters=3, finetune_lr=1e-5)
state3, Q3, hist3 = P.inference_finetune(cfg, pipe, state2.ema_params, data["cal"], data["test"])
m2 = pipe.evaluate(state3.ema_params, data["test"], Q3, jax.random.PRNGKey(3))
tick(f"posttrain+InfFT eval: Q={float(Q3):.4f} {json.dumps(m2)}")
print("SUMMARY", json.dumps({"pretrain20k": m0, "posttrain": m1, "posttrain_infft": m2,
                             "Q": [float(Q), float(Q2), float(Q3)]}))
