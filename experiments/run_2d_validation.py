"""Round-1 validation: 2D smoke at reference record scale (64^2, 32 frames)
on the TPU chip: generate a small dataset (256-frame rollouts), pretrain a
reduced UNet3D briefly, calibrate (inverted alpha), evaluate through the
256-frame solver."""
import time, json
import numpy as np, jax, jax.numpy as jnp

t0 = time.time()
def tick(msg): print(f"[{time.time()-t0:7.1f}s] {msg}", flush=True)

from safediffcon_tpu.tasks.smoke import (
    SmokeConformalConfig, SmokeDataset, SmokeInferenceConfig, SmokePipeline,
    SmokePretrainConfig, generate_smoke_dataset, pretrain, run_inference)

tick(f"devices: {jax.devices()}")
generate_smoke_dataset("/tmp/smoke_val.npz", n_train=96, n_cal=32, n_test=8,
                       n_frames=256, gen_batch=16)
tick("dataset generated (136 sims x 256 frames @128^2)")

data = {s: SmokeDataset.load("/tmp/smoke_val.npz", s) for s in ("train","cal","test")}
tick(f"train data {data['train'].data.shape}")

pre = SmokePretrainConfig(dim=32, dim_mults=(1, 2), batch_size=4,
                          checkpoint_every=10**9, compute_dtype="bfloat16")
state = pretrain(pre, data["train"], num_steps=300, log_every=100)
tick("pretrain 300 steps done")

conf = SmokeConformalConfig(cal_batch_size=32, num_cal_batch=1,
                            ddim_sampling_steps=50, test_batch_size=8)
pipe = SmokePipeline(conf, dim=32, dim_mults=(1, 2), compute_dtype="bfloat16")
rng = jax.random.PRNGKey(0)
Q = pipe.calibrate(state.ema_params, data["cal"], jnp.zeros(()), rng)
tick(f"Q-hat = {float(Q):.5f}")
m = pipe.evaluate(state.ema_params, data["test"], Q, jax.random.PRNGKey(1))
tick(f"eval (256-frame solver rollout): {json.dumps(m)}")
print("SUMMARY", json.dumps({"eval": m, "Q": float(Q)}))
