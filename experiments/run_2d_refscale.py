"""Round-2 reference-scale 2D smoke demonstration (VERDICT r1 item 5).

>=5k sims generated at native 128^2 x 256 frames (recorded 32x64^2 exactly
like 2d/ddpm/data_2d.py), bf16+remat pretrain of the reference UNet3D
topology (dim 64, mults (1,2,4), 7ch), then post-training and backward
finetune at the reference reproduce hyperparameters (BASELINE.md):
  posttrain: DDIM 100, alpha=.04, standard_fixed_ratio 100, w_safe .9,
             lr 1e-4, batch 14, cal 50x4 (2d/scripts/posttrain.sh)
  finetune:  DDIM 100, alpha=.01, ratio 495, w_safe 1, backward
             (2d/scripts/finetune.sh)
Step counts are scaled down from the reference's 200k/32k (env-tunable)
but model/data/sampler hyperparameters are the reproduce ones.
"""
import dataclasses
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


from safediffcon_tpu.tasks.smoke import (
    SmokeConformalConfig, SmokeDataset, SmokeInferenceConfig, SmokePipeline,
    SmokePretrainConfig, generate_smoke_dataset, pretrain, run_inference,
)

DATA = "/tmp/smoke_ref.npz"
CKPT_DIR = "/tmp/smoke_ref_ckpt"
N_TRAIN = int(os.environ.get("SMOKE_N_TRAIN", 5000))
PRETRAIN_STEPS = int(os.environ.get("SMOKE_PRETRAIN_STEPS", 3000))
PT_EPOCHS = int(os.environ.get("SMOKE_PT_EPOCHS", 2))
PT_STEPS = int(os.environ.get("SMOKE_PT_STEPS", 300))

tick(f"devices: {jax.devices()}")
if not os.path.exists(DATA):
    generate_smoke_dataset(DATA, n_train=N_TRAIN, n_cal=200, n_test=50,
                           n_frames=256, gen_batch=50, seed=0)
    tick(f"dataset generated ({N_TRAIN}/200/50 sims, 256 frames at 128^2)")
else:
    tick("dataset already on disk")

data = {s: SmokeDataset.load(DATA, s) for s in ("train", "cal", "test")}
tick(f"splits loaded: train={len(data['train'].data)} cal={len(data['cal'].data)} "
     f"test={len(data['test'].data)}")

# effective batch 14 = the reference's (7 per GPU x 2 GPUs, 2d/scripts/
# train.sh); micro-batch 7 + accumulation keeps the fwd+bwd UNet3D step
# inside one chip's HBM (batch-14 fwd+bwd OOMed the v5e in compile).
pre = SmokePretrainConfig(batch_size=7, gradient_accumulate_every=2,
                          checkpoint_every=1000, compute_dtype="bfloat16")
# 3.7 MB/sample records: stream batches from an HBM-resident bf16 pool
# instead of shipping ~50 MB/step over the tunnel. steps_per_call stays 1:
# with on-device data only int32 indices cross the tunnel per step, and the
# k-step scan multiplies the (already ~30 min) UNet3D fwd+bwd compile time.
state = pretrain(pre, data["train"], num_steps=PRETRAIN_STEPS, log_every=100,
                 checkpoint_dir=CKPT_DIR, resume_dir=CKPT_DIR,
                 steps_per_call=int(os.environ.get("SMOKE_K", 1)),
                 device_pool=2500)
tick(f"pretrain {PRETRAIN_STEPS} steps done")

results = {"n_train": N_TRAIN, "pretrain_steps": PRETRAIN_STEPS}

# --- post-training at reference hyperparameters (posttrain.sh) ---
conf = SmokeConformalConfig(alpha=0.04, standard_fixed_ratio=100.0,
                            w_safe=0.9, cal_batch_size=50, num_cal_batch=4,
                            ddim_sampling_steps=100, test_batch_size=25)
pipe = SmokePipeline(conf, compute_dtype="bfloat16", cal_chunk=25)
cfg = SmokeInferenceConfig(conformal=conf, finetune_epoch=PT_EPOCHS,
                           finetune_steps=PT_STEPS, finetune_batch_size=7,
                           finetune_lr=1e-4)
params, Q, hist = run_inference(cfg, pipe, state.ema_params,
                                data["train"], data["cal"], data["test"])
tick(f"posttrain done Q={float(Q):.5f}")
for h in hist:
    tick(f"  epoch {h['epoch']}: J_target={h['eval']['J_target']:.5f} "
         f"unsafe%={h['eval']['unsafe_percentage']:.1f} "
         f"unsafe_t%={h['eval']['unsafe_percentage_time']:.1f} loss={h['loss']:.4f}")
results["posttrain_history"] = hist
results["Q_posttrain"] = float(Q)
# record posttrain results immediately — the backward phase is optional and
# a wall-clock kill there must not lose these
with open("/root/repo/experiments/validation_2d_refscale_round2.json", "w") as f:
    json.dump(results, f, indent=1, sort_keys=True)

if os.environ.get("SMOKE_DO_BACKWARD", "1") != "1":
    print("SUMMARY", json.dumps(results))
    tick("done (backward phase skipped via SMOKE_DO_BACKWARD=0)")
    raise SystemExit(0)

# --- backward finetune (finetune.sh: alpha .01, ratio 495, w_safe 1) ---
bconf = SmokeConformalConfig(alpha=0.01, standard_fixed_ratio=495.0,
                             w_safe=1.0, cal_batch_size=50, num_cal_batch=4,
                             ddim_sampling_steps=100, use_guidance=False,
                             test_batch_size=25)
pipe_b = SmokePipeline(bconf, compute_dtype="bfloat16", finetune_set="test",
                       cal_chunk=25)
bcfg = SmokeInferenceConfig(conformal=bconf, backward_finetune=True,
                            finetune_epoch=2, finetune_steps=1)
params_b, Q_b, hist_b = run_inference(bcfg, pipe_b, params, None,
                                      data["cal"], data["test"])
tick(f"backward finetune done Q={float(Q_b):.5f}")
results["backward_history"] = hist_b
results["Q_backward"] = float(Q_b)

print("SUMMARY", json.dumps(results))
with open("/root/repo/experiments/validation_2d_refscale_round2.json", "w") as f:
    json.dump(results, f, indent=1, sort_keys=True)
tick("done")
