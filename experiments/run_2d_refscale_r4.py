"""Round-4 reference-scale 2D smoke run (VERDICT r3 next #2/#3/#5/#6).

Differences from round 3 (run_2d_refscale_r3.py):
  - pretrain extended well past the 3k-step round-3 base (default 30k
    steps, env-tunable) toward the reference's 200k
    (2d/scripts/train.sh), resuming from the persisted step-3000
    milestone; remat policy env-selectable after the MFU study
  - posttrain at the full posttrain.sh schedule (8 epochs x 4000 steps,
    env-tunable, deadline-capped)
  - backward finetune (finetune.sh) with cal_chunk=10: round-3's crashes
    clustered on the ONLY chunk-20 program (see
    experiments/isolate_kernel_fault_r4.py docstring for the corrected
    diagnosis — the calibration program contains no pressure solve)
  - every phase runs under run_inference_resilient: a TPU worker crash
    re-inits the backend in-process and resumes from the epoch state
  - final before/after evals over EVAL_SEEDS seeds (mean +- std) so the
    headline rows sit outside the measured eval-noise band
  - all state under /root/repo/artifacts (durable), not /tmp

Reference flow: 2d/scripts/{train,posttrain,finetune}.sh,
2d/inference_2d.py:286-368 (run loop), :482-496 (metrics).
"""
import json
import logging
import os
import shutil
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
    SmokePretrainConfig, pretrain, run_inference_resilient,
)
from safediffcon_tpu.tasks.smoke.data import RESCALER

ART = "/root/repo/artifacts"
DATA_NPZ = os.path.join(ART, "smoke_ref.npz")
RAW_DIR = "/tmp/smoke_ref_raw"  # mmap cache (18 GB, regenerable from npz)
CKPT_DIR = os.path.join(ART, "smoke_ckpts_r4")
PT_STATE = os.path.join(ART, "smoke_pt_state_r4")
BW_STATE = os.path.join(ART, "smoke_bw_state_r4")
OUT = "/root/repo/experiments/validation_2d_refscale_round4.json"

PRETRAIN_STEPS = int(os.environ.get("SMOKE_PRETRAIN_STEPS", 30000))
REMAT_POLICY = os.environ.get("SMOKE_REMAT_POLICY", "full")
CONV_IMPL = os.environ.get("SMOKE_CONV_IMPL", "xla")
ATTN_IMPL = os.environ.get("SMOKE_ATTN_IMPL", "heads")
PT_EPOCHS = int(os.environ.get("SMOKE_PT_EPOCHS", 8))
PT_STEPS = int(os.environ.get("SMOKE_PT_STEPS", 4000))
BW_EPOCHS = int(os.environ.get("SMOKE_BW_EPOCHS", 4))
BW_BATCH = int(os.environ.get("SMOKE_BW_BATCH", 5))
EVAL_SEEDS = int(os.environ.get("SMOKE_EVAL_SEEDS", 5))
DEADLINE = float(os.environ.get("SMOKE_DEADLINE_TS", 0)) or None
BW_RESERVE_S = float(os.environ.get("SMOKE_BW_RESERVE_S", 7200))
PT_DEADLINE = (DEADLINE - BW_RESERVE_S) if DEADLINE else None

tick(f"devices: {jax.devices()}")

# ---- data (mmap cache extracted from the durable npz) ----
if not os.path.exists(os.path.join(RAW_DIR, "train_data.npy")):
    os.makedirs(RAW_DIR, exist_ok=True)
    with zipfile.ZipFile(DATA_NPZ) as z:
        z.extractall(RAW_DIR)
    tick("npz extracted to raw .npy for mmap loads")


def load_split(split):
    raw = np.load(os.path.join(RAW_DIR, f"{split}_data.npy"), mmap_mode="r")
    if split == "train":
        # Persist the normalized train split once and mmap it afterwards:
        # dividing the 18 GB mmap in-process costs ~12 min of first-touch
        # page zeroing on this host (~25 MB/s, BASELINE.md), which made
        # every watchdog relaunch prohibitively slow. pretrain only reads
        # `.data` (the device pool gathers from it), so an mmap is fine.
        scaled = os.path.join(RAW_DIR, "train_data_scaled.npy")
        if not os.path.exists(scaled):
            tmp = scaled + ".tmp.npy"
            np.save(tmp, (raw / RESCALER).astype(np.float32, copy=False))
            os.replace(tmp, scaled)
            tick("normalized train split persisted for cheap relaunches")
        return SmokeDataset(data=np.load(scaled, mmap_mode="r"), raw=raw)
    raw = np.asarray(raw)
    return SmokeDataset(data=(raw / RESCALER).astype(np.float32, copy=False),
                        raw=raw)


data = {s: load_split(s) for s in ("train", "cal", "test")}
tick(f"splits loaded: train={len(data['train'].data)} "
     f"cal={len(data['cal'].data)} test={len(data['test'].data)}")

# ---- pretrain continuation (resume from the round-3 step-3000 milestone) ----
if not os.path.exists(CKPT_DIR):
    os.makedirs(CKPT_DIR, exist_ok=True)
    src = os.path.join(ART, "smoke_pretrain_ckpt-3000")
    if os.path.exists(src):
        shutil.copytree(src, os.path.join(CKPT_DIR, "ckpt-3000"))
        tick("seeded r4 checkpoint dir from the round-3 step-3000 milestone")

pre = SmokePretrainConfig(batch_size=7, gradient_accumulate_every=2,
                          checkpoint_every=int(os.environ.get("SMOKE_CKPT_EVERY", 5000)),
                          compute_dtype="bfloat16", remat_policy=REMAT_POLICY,
                          conv_impl=CONV_IMPL, attn_impl=ATTN_IMPL)

# Deadline-gated chunked pretrain (round-5 fix): the posttrain/backward
# phases were deadline-gated but pretrain was not, so a slower-than-planned
# step rate ate the whole window and the run died mid-pretrain with no
# posttrain record. Run pretrain in CHUNK-step segments (each resumes from
# and re-saves the latest checkpoint — run_train_loop always checkpoints at
# its final step) and stop early when the measured per-chunk rate says the
# next chunk would cross SMOKE_PRETRAIN_DEADLINE_TS.
PT_CHUNK = int(os.environ.get("SMOKE_PRETRAIN_CHUNK", 0))
PRETRAIN_DEADLINE = float(os.environ.get("SMOKE_PRETRAIN_DEADLINE_TS", 0)) or None
STEPS_PER_CALL = int(os.environ.get("SMOKE_K", 1))
POOL = int(os.environ.get("SMOKE_POOL", 2500))  # HBM sample pool; drop if tunnel uploads look implicated in hangs
if PT_CHUNK <= 0 or PRETRAIN_DEADLINE is None:
    state = pretrain(pre, data["train"], num_steps=PRETRAIN_STEPS, log_every=100,
                     checkpoint_dir=CKPT_DIR, resume_dir=CKPT_DIR,
                     steps_per_call=STEPS_PER_CALL,
                     device_pool=POOL, pool_refresh_every=2000)
else:
    from safediffcon_tpu.utils.checkpoint import latest_step

    chunk_rate = None  # measured s/step incl. per-chunk resume overhead
    while True:
        cur = latest_step(CKPT_DIR) or 0
        if cur >= PRETRAIN_STEPS:
            target = cur  # already at/after the cap: one no-op call below
        else:
            target = min(cur + PT_CHUNK, PRETRAIN_STEPS)
        left = PRETRAIN_DEADLINE - time.time()
        if cur > 0 and target > cur and chunk_rate is not None and \
                (target - cur) * chunk_rate > left:
            tick(f"pretrain deadline gate: stopping at step {cur} "
                 f"({left:.0f}s left < {(target - cur) * chunk_rate:.0f}s "
                 f"needed for the next chunk)")
            target = cur
        tc = time.time()
        state = pretrain(pre, data["train"], num_steps=target, log_every=100,
                         checkpoint_dir=CKPT_DIR, resume_dir=CKPT_DIR,
                         steps_per_call=STEPS_PER_CALL,
                         device_pool=POOL, pool_refresh_every=2000)
        if target > cur:
            chunk_rate = (time.time() - tc) / (target - cur)
            tick(f"pretrain chunk {cur}->{target}: {chunk_rate:.2f} s/step")
        if target >= PRETRAIN_STEPS or target == cur:
            PRETRAIN_STEPS = target  # record the actually-reached depth
            break
tick(f"pretrain at {PRETRAIN_STEPS} steps (remat={REMAT_POLICY})")

results = {"pretrain_steps": PRETRAIN_STEPS, "remat_policy": REMAT_POLICY,
           "conv_impl": CONV_IMPL, "attn_impl": ATTN_IMPL,
           "pt_epochs": PT_EPOCHS, "pt_steps": PT_STEPS,
           "bw_epochs": BW_EPOCHS, "eval_seeds": EVAL_SEEDS}
if os.path.exists(OUT):
    try:
        with open(OUT) as f:
            results = {**json.load(f), **results}
    except (json.JSONDecodeError, OSError):
        tick(f"WARNING: unreadable prior results at {OUT}, starting fresh")


def dump():
    tmp = OUT + ".tmp"
    with open(tmp, "w") as f:
        json.dump(results, f, indent=1, sort_keys=True)
    os.replace(tmp, OUT)


def _dedup_append(key, rec):
    h = results[key]
    h[:] = [r for r in h if r["epoch"] != rec["epoch"]] + [rec]


def seeded_eval(pipe, params, Q, tag, guided, n_seeds=EVAL_SEEDS):
    """Mean +- std over eval seeds (VERDICT r3 weak #4: single-seed deltas
    sit inside the ~0.1 seed spread)."""
    rows = []
    for s in range(n_seeds):
        m = pipe.evaluate(params, data["test"], Q,
                          jax.random.PRNGKey(7000 + s), guided=guided)
        rows.append({k: float(v) for k, v in m.items()})
        tick(f"{tag} eval seed {s}: {rows[-1]}")
    agg = {k: {"mean": float(np.mean([r[k] for r in rows])),
               "std": float(np.std([r[k] for r in rows]))}
           for k in rows[0]}
    results[tag] = {"per_seed": rows, "agg": agg}
    dump()
    return agg


dump()

# ---- unguided baseline eval of the pretrained model (multi-seed) ----
conf = SmokeConformalConfig(alpha=0.04, standard_fixed_ratio=100.0,
                            w_safe=0.9, cal_batch_size=50, num_cal_batch=4,
                            ddim_sampling_steps=100, test_batch_size=25)
make_pipe = lambda: SmokePipeline(conf, compute_dtype="bfloat16",
                                  attn_impl=ATTN_IMPL,
                                  cal_chunk=10, eval_chunk=10)
if os.environ.get("SMOKE_BASELINE_EVAL", "1") == "1" and \
        f"baseline_eval_unguided_{PRETRAIN_STEPS}" not in results:
    pipe = make_pipe()
    seeded_eval(pipe, state.ema_params, jnp.zeros(()),
                f"baseline_eval_unguided_{PRETRAIN_STEPS}", guided=False)

# ---- posttrain (posttrain.sh hyperparameters) ----
cfg = SmokeInferenceConfig(conformal=conf, finetune_epoch=PT_EPOCHS,
                           finetune_steps=PT_STEPS, finetune_batch_size=7,
                           finetune_lr=1e-4, device_pool=POOL)
results.setdefault("posttrain_history", [])


def on_epoch(rec):
    _dedup_append("posttrain_history", rec)
    dump()
    tick(f"posttrain epoch {rec['epoch']} Q={rec['quantile']:.5f} "
         f"eval={rec['eval']}")


params, Q, hist = run_inference_resilient(
    cfg, make_pipe, state.ema_params, data["train"], data["cal"],
    data["test"], on_epoch=on_epoch, deadline=PT_DEADLINE,
    state_dir=PT_STATE)
tick(f"posttrain done Q={float(Q):.5f}")
results["Q_posttrain"] = float(Q)
dump()

if os.environ.get("SMOKE_PT_SEEDED_EVAL", "1") == "1" and \
        "posttrain_eval_seeded" not in results:
    seeded_eval(make_pipe(), params, Q, "posttrain_eval_seeded", guided=True)

if os.environ.get("SMOKE_DO_BACKWARD", "1") != "1":
    print("SUMMARY", json.dumps(results))
    tick("done (backward phase skipped via SMOKE_DO_BACKWARD=0)")
    raise SystemExit(0)

# ---- backward finetune (finetune.sh) — cal_chunk 10, resilient ----
bconf = SmokeConformalConfig(alpha=0.01, standard_fixed_ratio=495.0,
                             w_safe=1.0, cal_batch_size=40, num_cal_batch=1,
                             ddim_sampling_steps=100, use_guidance=False,
                             test_batch_size=BW_BATCH)
make_pipe_b = lambda: SmokePipeline(bconf, compute_dtype="bfloat16",
                                    attn_impl=ATTN_IMPL,
                                    finetune_set="test", cal_chunk=10,
                                    eval_chunk=10)
bcfg = SmokeInferenceConfig(conformal=bconf, backward_finetune=True,
                            finetune_epoch=BW_EPOCHS, finetune_steps=1)
results.setdefault("backward_history", [])


def on_epoch_b(rec):
    _dedup_append("backward_history", rec)
    dump()
    tick(f"backward epoch {rec['epoch']} Q={rec['quantile']:.5f} "
         f"eval={rec['eval']}")


params_b, Q_b, hist_b = run_inference_resilient(
    bcfg, make_pipe_b, params, None, data["cal"], data["test"],
    on_epoch=on_epoch_b, deadline=DEADLINE, state_dir=BW_STATE)
tick(f"backward finetune done Q={float(Q_b):.5f}")
results["Q_backward"] = float(Q_b)
dump()

if os.environ.get("SMOKE_BW_SEEDED_EVAL", "1") == "1":
    seeded_eval(make_pipe_b(), params_b, Q_b, "backward_eval_seeded",
                guided=False)

print("SUMMARY", json.dumps(results))
dump()
tick("done")
