"""Round-1 validation: real tokamak run on the TPU chip. Generates 6k
closed-loop trajectories, pretrains the turbo UNet1D, calibrates, runs a
posttrain epoch and a backward-finetune epoch, evaluates via the vmapped
KSTAR surrogate."""
import time, json
import numpy as np, jax, jax.numpy as jnp

t0 = time.time()
def tick(msg): print(f"[{time.time()-t0:7.1f}s] {msg}", flush=True)

from safediffcon_tpu.tasks.tokamak import (
    TokamakConformalConfig, TokamakDataset, TokamakInferenceConfig,
    TokamakPipeline, TokamakPretrainConfig, generate_tokamak_dataset,
    pretrain, run_inference)

tick(f"devices: {jax.devices()}")
generate_tokamak_dataset("/tmp/tok_val.npz", n_train=5000, n_cal=1000, n_test=50, gen_batch=512)
tick("dataset generated (6050 closed-loop trajectories)")

data = {s: TokamakDataset.load("/tmp/tok_val.npz", s) for s in ("train","cal","test")}
pre = TokamakPretrainConfig(dim=128, batch_size=16, checkpoint_every=10**9,
                            compute_dtype="bfloat16")
state = pretrain(pre, data["train"], num_steps=2500, log_every=500)
tick("pretrain 2500 steps done")

conf = TokamakConformalConfig(guidance_scaler=5.0)
pipe = TokamakPipeline(conf, dim=128, compute_dtype="bfloat16")
rng = jax.random.PRNGKey(0)
Q = pipe.calibrate(state.ema_params, data["cal"], jnp.zeros(()), rng)
tick(f"Q-hat = {float(Q):.5f}")
m0 = pipe.evaluate(state.ema_params, data["test"], Q, jax.random.PRNGKey(1))
tick(f"eval after pretrain: {json.dumps(m0)}")

cfg = TokamakInferenceConfig(conformal=conf, finetune_epoch=2, finetune_steps=20,
                             train_batch_size=256, finetune_lr=7e-6)
params, Q2, hist = run_inference(cfg, pipe, state.ema_params,
                                 data["train"], data["cal"], data["test"])
tick(f"posttrain done, Q={float(Q2):.5f}")
m1 = hist[-1]["eval"]
print("SUMMARY", json.dumps({"pretrain_eval": m0, "posttrain_eval": m1,
                             "Q_pre": float(Q), "Q_post": float(Q2)}))
