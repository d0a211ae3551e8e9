"""Round-1 validation #3 (2D): posttrain + backward-finetune phases on TPU
with real generated data (64^2 records, 256-frame solver evals)."""
import time, json
import numpy as np, jax, jax.numpy as jnp

t0 = time.time()
def tick(msg): print(f"[{time.time()-t0:7.1f}s] {msg}", flush=True)

from safediffcon_tpu.tasks.smoke import (
    SmokeConformalConfig, SmokeDataset, SmokeInferenceConfig, SmokePipeline,
    SmokePretrainConfig, generate_smoke_dataset, pretrain, run_inference)

tick(f"devices: {jax.devices()}")
generate_smoke_dataset("/tmp/smoke_val2.npz", n_train=96, n_cal=32, n_test=8,
                       n_frames=256, gen_batch=16, seed=7)
tick("dataset generated")
data = {s: SmokeDataset.load("/tmp/smoke_val2.npz", s) for s in ("train","cal","test")}

pre = SmokePretrainConfig(dim=32, dim_mults=(1, 2), batch_size=4,
                          checkpoint_every=10**9, compute_dtype="bfloat16")
state = pretrain(pre, data["train"], num_steps=400, log_every=100)
tick("pretrain 400 steps done")

conf = SmokeConformalConfig(cal_batch_size=32, num_cal_batch=1,
                            ddim_sampling_steps=50, test_batch_size=8,
                            standard_fixed_ratio=100.0, w_safe=0.9)
pipe = SmokePipeline(conf, dim=32, dim_mults=(1, 2), compute_dtype="bfloat16")

# posttrain phase (weighted diffusion loss on the train set)
cfg = SmokeInferenceConfig(conformal=conf, finetune_epoch=2, finetune_steps=50,
                           finetune_batch_size=4, finetune_lr=1e-4)
params, Q, hist = run_inference(cfg, pipe, state.ema_params,
                                data["train"], data["cal"], data["test"])
tick(f"posttrain done Q={float(Q):.5f}")
for h in hist:
    tick(f"epoch {h['epoch']}: J_target={h['eval']['J_target']:.5f} "
         f"unsafe%={h['eval']['unsafe_percentage']:.1f} loss={h['loss']:.4f}")

# backward-finetune (InfFT) phase
bf = SmokeInferenceConfig(
    conformal=SmokeConformalConfig(cal_batch_size=32, num_cal_batch=1,
                                   ddim_sampling_steps=50, test_batch_size=8,
                                   standard_fixed_ratio=100.0, w_safe=1.0,
                                   use_guidance=False, alpha=0.01),
    backward_finetune=True, finetune_epoch=1, finetune_steps=1)
pipe2 = SmokePipeline(bf.conformal, dim=32, dim_mults=(1, 2),
                      compute_dtype="bfloat16", finetune_set="test")
params2, Q2, hist2 = run_inference(bf, pipe2, params, None, data["cal"], data["test"])
tick(f"backward finetune done Q={float(Q2):.5f}")
print("SUMMARY", json.dumps({"posttrain_history": hist, "backward_history": hist2}))
