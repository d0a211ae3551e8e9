"""Round-3 reference-scale 2D smoke demonstration (VERDICT r2 item 1).

The one undemonstrated reference headline: an at-scale 2D posttrain +
backward-finetune quality result. 5,000 sims were generated in round 2 at
native 128^2 x 256 frames (recorded 32x64^2 exactly like 2d/ddpm/data_2d.py)
and survive at /tmp/smoke_ref.npz; regenerate with
  python - <<'EOF'
  from safediffcon_tpu.tasks.smoke import generate_smoke_dataset
  generate_smoke_dataset("/tmp/smoke_ref.npz", n_train=5000, n_cal=200,
                         n_test=50, n_frames=256, gen_batch=50, seed=0)
  EOF
(~1.8 h on one v5e chip, 0.98 s/sim measured in round 2).

Phases at the reference reproduce hyperparameters (BASELINE.md):
  pretrain:  bf16+remat UNet3D (dim 64, mults (1,2,4), 7ch), effective
             batch 14 (= the reference's 7/GPU x 2 GPUs, 2d/scripts/train.sh)
             as micro-batch 7 x accum 2 on one chip.
  posttrain: DDIM 100, alpha=.04, standard_fixed_ratio 100, w_safe .9,
             lr 1e-4, batch 14, cal 50x4 (2d/scripts/posttrain.sh)
  finetune:  DDIM 100, alpha=.01, ratio 495, w_safe 1, backward
             (2d/scripts/finetune.sh)

Step-count argument (VERDICT r2 weak #1 asked for this in writing): the
reference pretrains 200k steps x batch 14 over 19,800 sims = ~141 data
epochs. On this host the UNet3D fwd+bwd optimizer step measures ~2.5 s
(42.4 TFLOP/step by XLA cost analysis before remat recompute — ~11% MFU,
a documented headroom item, BASELINE.md), so 20k steps is a ~14-hour job
and 200k is ~6 days — neither fits a round. What the at-scale result
needs from the pretrain is a converged-loss model to measure the
posttrain/backward-finetune deltas (the quantities under test) from: the
denoising loss plateaus by step ~1,500 on this 5,000-sim dataset
(0.83 @100 -> 0.030 @200 -> 0.021 @300 -> ~0.02 plateau; full curve in
the run log at log_every=100), and we train 2-3x past that plateau to
the session's chip budget. Posttrain runs PT_EPOCHS x 1000 steps vs the
reference's 8 x 4000; the reference's own results.yaml convention
reports per-epoch evals, and the safety/objective movement is visible
within the first epochs. All counts are env-tunable
(SMOKE_PRETRAIN_STEPS / SMOKE_PT_EPOCHS / SMOKE_PT_STEPS).
"""
import json
import logging
import os
import time
import zipfile

import numpy as np

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
from safediffcon_tpu.tasks.smoke.data import RESCALER

DATA = "/tmp/smoke_ref.npz"
RAW_DIR = "/tmp/smoke_ref_raw"  # uncompressed .npy per split for mmap loads
CKPT_DIR = "/tmp/smoke_ref_ckpt"
OUT = "/root/repo/experiments/validation_2d_refscale_round3.json"
N_TRAIN = int(os.environ.get("SMOKE_N_TRAIN", 5000))
# 5000 = ~3.3x past the observed loss plateau (~step 1500 on this dataset,
# see module docstring); the quantities under test are the posttrain /
# backward-finetune DELTAS, which need a converged-loss base model, not a
# reference-length 200k run (6 days on one chip at 2.5 s/step)
PRETRAIN_STEPS = int(os.environ.get("SMOKE_PRETRAIN_STEPS", 5000))
PT_EPOCHS = int(os.environ.get("SMOKE_PT_EPOCHS", 4))
PT_STEPS = int(os.environ.get("SMOKE_PT_STEPS", 1000))
BW_EPOCHS = int(os.environ.get("SMOKE_BW_EPOCHS", 4))
# wall-clock budget: stop starting new posttrain/backward epochs past these
# (completed epochs are persisted incrementally via on_epoch); 0 = no cap
DEADLINE = float(os.environ.get("SMOKE_DEADLINE_TS", 0)) or None
# reserve time for at least one backward epoch within the overall deadline
PT_DEADLINE = (DEADLINE - float(os.environ.get("SMOKE_BW_RESERVE_S", 5400))
               if DEADLINE else None)

tick(f"devices: {jax.devices()}")
if not os.path.exists(DATA) and not os.path.exists(RAW_DIR):
    generate_smoke_dataset(DATA, n_train=N_TRAIN, n_cal=200, n_test=50,
                           n_frames=256, gen_batch=50, seed=0)
    tick(f"dataset generated ({N_TRAIN}/200/50 sims, 256 frames at 128^2)")

# one-time extraction: deflated npz -> raw .npy files (np.load on the npz
# decompresses 19 GB every launch, ~14 min; mmap of raw .npy is seconds)
if not os.path.exists(os.path.join(RAW_DIR, "train_data.npy")):
    os.makedirs(RAW_DIR, exist_ok=True)
    with zipfile.ZipFile(DATA) as z:
        z.extractall(RAW_DIR)
    tick("npz extracted to raw .npy for mmap loads")


def load_split(split):
    raw = np.load(os.path.join(RAW_DIR, f"{split}_data.npy"), mmap_mode="r")
    if split == "train":
        # pretrain only touches .data; keep raw as the mmap (unused)
        return SmokeDataset(data=(raw / RESCALER).astype(np.float32, copy=False), raw=raw)
    raw = np.asarray(raw)
    return SmokeDataset(data=(raw / RESCALER).astype(np.float32, copy=False), raw=raw)


data = {s: load_split(s) for s in ("train", "cal", "test")}
tick(f"splits loaded: train={len(data['train'].data)} cal={len(data['cal'].data)} "
     f"test={len(data['test'].data)}")

pre = SmokePretrainConfig(batch_size=7, gradient_accumulate_every=2,
                          checkpoint_every=1000, compute_dtype="bfloat16")
# 3.7 MB/sample records: stream batches from an HBM-resident bf16 pool
# (pool passed as an argument — round 2 captured it as a 4.6 GB HLO
# constant, which is what made remote compiles take 30-50 min).
# pool_refresh_every=2000 re-draws the pool so all 5000 sims are trained
# on (ADVICE r2: a pinned one-time pool halves the effective train set).
state = pretrain(pre, data["train"], num_steps=PRETRAIN_STEPS, log_every=100,
                 checkpoint_dir=CKPT_DIR, resume_dir=CKPT_DIR,
                 steps_per_call=int(os.environ.get("SMOKE_K", 1)),
                 device_pool=2500, pool_refresh_every=2000)
tick(f"pretrain {PRETRAIN_STEPS} steps done")

results = {"n_train": N_TRAIN, "pretrain_steps": PRETRAIN_STEPS,
           "effective_train_set": "full 5000 (device pool 2500, refreshed every 2000 steps)",
           "pt_epochs": PT_EPOCHS, "pt_steps": PT_STEPS}
# a restarted run keeps previously persisted results (baseline eval,
# completed posttrain/backward epochs); the phase state_dir below resumes
# params/opt/Q at epoch granularity
if os.path.exists(OUT):
    try:
        with open(OUT) as f:
            results = {**json.load(f), **results}
    except (json.JSONDecodeError, OSError):
        tick(f"WARNING: unreadable prior results at {OUT}, starting fresh")


def dump():
    # atomic: a crash mid-write must not poison the next retry's load
    tmp = OUT + ".tmp"
    with open(tmp, "w") as f:
        json.dump(results, f, indent=1, sort_keys=True)
    os.replace(tmp, OUT)


def _dedup_append(key, rec):
    """Replace-by-epoch: resume replays restored epoch records through the
    callback, so plain append would duplicate rows."""
    h = results[key]
    h[:] = [r for r in h if r["epoch"] != rec["epoch"]] + [rec]


dump()

# --- post-training at reference hyperparameters (posttrain.sh) ---
conf = SmokeConformalConfig(alpha=0.04, standard_fixed_ratio=100.0,
                            w_safe=0.9, cal_batch_size=50, num_cal_batch=4,
                            ddim_sampling_steps=100, test_batch_size=25)
cal_chunk = int(os.environ.get("SMOKE_CAL_CHUNK", 10))
# chunk 10 (was 25): two TPU-worker crashes surfaced right after the
# guided calibration chunks were queued; smaller chunks cut peak HBM per
# program (the math is per-sample, chunking is exact)
pipe = SmokePipeline(conf, compute_dtype="bfloat16", cal_chunk=cal_chunk,
                     eval_chunk=10)

# Unguided baseline eval of the pretrained model: the natural "before" row
# (plain diffusion, no safety guidance, no Q needed so no 200-sample
# calibration pass — affordable inside the chip-time budget). The
# posttrain/backward epoch evals below measure their deltas against this.
if (os.environ.get("SMOKE_BASELINE_EVAL", "1") == "1"
        and "baseline_eval_unguided" not in results):
    base_eval = pipe.evaluate(state.ema_params, data["test"], jnp.zeros(()),
                              jax.random.PRNGKey(1234), guided=False)
    results["baseline_eval_unguided"] = {k: float(v) for k, v in base_eval.items()}
    dump()
    tick(f"baseline (pretrain, unguided) eval: {results['baseline_eval_unguided']}")
cfg = SmokeInferenceConfig(conformal=conf, finetune_epoch=PT_EPOCHS,
                           finetune_steps=PT_STEPS, finetune_batch_size=7,
                           finetune_lr=1e-4, device_pool=2500)
results.setdefault("posttrain_history", [])


def on_epoch(rec):
    _dedup_append("posttrain_history", rec)
    dump()
    tick(f"posttrain epoch {rec['epoch']} Q={rec['quantile']:.5f} "
         f"eval={rec['eval']}")


params, Q, hist = run_inference(cfg, pipe, state.ema_params,
                                data["train"], data["cal"], data["test"],
                                on_epoch=on_epoch, deadline=PT_DEADLINE,
                                state_dir="/tmp/smoke_pt_state")
tick(f"posttrain done Q={float(Q):.5f}")
for h in results["posttrain_history"]:
    tick(f"  epoch {h['epoch']}: J_target={h['eval']['J_target']:.5f} "
         f"unsafe%={h['eval']['unsafe_percentage']:.1f} "
         f"unsafe_t%={h['eval']['unsafe_percentage_time']:.1f} loss={h['loss']:.4f}")
results["Q_posttrain"] = float(Q)
dump()  # posttrain results persisted before the optional backward phase

if os.environ.get("SMOKE_DO_BACKWARD", "1") != "1":
    print("SUMMARY", json.dumps(results))
    tick("done (backward phase skipped via SMOKE_DO_BACKWARD=0)")
    raise SystemExit(0)

# --- backward finetune (finetune.sh: alpha .01, ratio 495, w_safe 1,
# cal 40x1, test_backward_batch_size 13 on the reference's GPU; here the
# backward step's AOT footprint measures ~1.6 GB/sample (39.9 GB at B=25),
# so batch 5 keeps the program inside the 15.75 GB chip) ---
BW_BATCH = int(os.environ.get("SMOKE_BW_BATCH", 5))
bconf = SmokeConformalConfig(alpha=0.01, standard_fixed_ratio=495.0,
                             w_safe=1.0, cal_batch_size=40, num_cal_batch=1,
                             ddim_sampling_steps=100, use_guidance=False,
                             test_batch_size=BW_BATCH)
pipe_b = SmokePipeline(bconf, compute_dtype="bfloat16", finetune_set="test",
                       cal_chunk=20, eval_chunk=10)
bcfg = SmokeInferenceConfig(conformal=bconf, backward_finetune=True,
                            finetune_epoch=BW_EPOCHS, finetune_steps=1)
results.setdefault("backward_history", [])


def on_epoch_b(rec):
    _dedup_append("backward_history", rec)
    dump()
    tick(f"backward epoch {rec['epoch']} Q={rec['quantile']:.5f} "
         f"eval={rec['eval']}")


params_b, Q_b, hist_b = run_inference(bcfg, pipe_b, params, None,
                                      data["cal"], data["test"],
                                      on_epoch=on_epoch_b, deadline=DEADLINE,
                                      state_dir="/tmp/smoke_bw_state")
tick(f"backward finetune done Q={float(Q_b):.5f}")
results["Q_backward"] = float(Q_b)

print("SUMMARY", json.dumps(results))
dump()
tick("done")
