"""Round-1 validation #2 (1D): inference-time fine-tuning on real data,
plus a bf16-vs-fp32 inference quality check on the same trained weights."""
import time, json
import numpy as np, jax, jax.numpy as jnp

t0 = time.time()
def tick(msg): print(f"[{time.time()-t0:7.1f}s] {msg}", flush=True)

from safediffcon_tpu.tasks.burgers.data import generate_burgers_dataset, BurgersDataset
from safediffcon_tpu.tasks.burgers.config import (
    BurgersConformalConfig, BurgersInfFTConfig, BurgersPretrainConfig)
from safediffcon_tpu.tasks.burgers import pipeline as P

tick(f"devices: {jax.devices()}")
generate_burgers_dataset("/tmp/burgers_val2.npz", n_train=12000, n_cal=1000, n_test=50, seed=1)
tick("dataset generated")
data = {s: BurgersDataset.load("/tmp/burgers_val2.npz", s) for s in ("train","cal","test")}

pre = BurgersPretrainConfig(dim=128, batch_size=16, lr=1e-4, checkpoint_every=10**9,
                            compute_dtype="bfloat16")
state = P.pretrain(pre, data["train"], num_steps=2500, log_every=500)
tick("pretrain 2500 steps done")

# bf16 vs fp32 inference quality on the SAME weights
rng = jax.random.PRNGKey(0)
results = {}
for dt in ("bfloat16", "float32"):
    pipe = P.BurgersPipeline(BurgersConformalConfig(w_score=500.0), dim=128, compute_dtype=dt)
    Q = pipe.calibrate(state.ema_params, data["cal"].data, jnp.zeros(()), rng)
    m = pipe.evaluate(state.ema_params, data["test"], Q, jax.random.PRNGKey(1))
    results[dt] = {"Q": float(Q), **m}
    tick(f"{dt}: Q={float(Q):.4f} J={m['control_mse_mean (J)']:.4f} R_t={m['time_exceed_ratio (R_t)']:.4f}")

# InfFT (reproduce flow shape: 3 iters, w_score 500)
pipe = P.BurgersPipeline(BurgersConformalConfig(w_score=500.0), dim=128, compute_dtype="bfloat16")
cfg = BurgersInfFTConfig(InfFT_iters=3, finetune_lr=1e-5)
state2, Q2, hist = P.inference_finetune(cfg, pipe, state.ema_params, data["cal"], data["test"])
tick(f"InfFT done, Q={float(Q2):.4f}")
m_ft = pipe.evaluate(state2.ema_params, data["test"], Q2, jax.random.PRNGKey(2))
tick(f"eval after InfFT: {json.dumps(m_ft)}")
print("SUMMARY", json.dumps({"dtype_check": results, "infft_eval": m_ft,
                             "infft_history": hist, "Q_infft": float(Q2)}))
