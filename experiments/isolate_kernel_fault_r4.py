"""Round-4 isolation of the round-3 TPU worker kernel faults (VERDICT #1).

Round-3 evidence (experiments/smoke_backward_crash_round3.log): three
at-scale 2D crashes — attempts 3 and 5 inside the BACKWARD CALIBRATION
program (cal 40x1 in chunks of 20: DDIM-100 unguided UNet3D sampling +
pure-reduction conformal score), attempt 1 inside the unguided baseline
EVAL (chunks of 10: sampling + solver rollout).

CORRECTED diagnosIS vs the round-3 notes: the round-3 write-up blamed the
Pallas pressure-CG kernel as the common factor, but the calibration
program contains NO pressure solve at all — smoke `conformal_score`
(tasks/smoke/task.py:121-127) and `shift_weights` are pure reductions;
the solver only runs inside `_evaluate`. The true common factor of all
three crash sites is the DDIM-100 UNet3D bf16 sampling scan; the one
configuration that crashed deterministically (2/2) was the only program
run at cal chunk 20 — every chunk-10 program passed at least twice.

This script replays the exact crash programs in bounded form, in order
of information value:
  P1  backward calibration, chunk 20 (the 2/2 crasher), x REPEATS
  P2  backward calibration, chunk 10 (the proven-good posttrain size)
  P3  unguided eval, chunk 10, solver backend = xla   (sporadic 1/3 site)
  P4  unguided eval, chunk 10, solver backend = pallas (v2 kernel)
  P5  unguided eval, chunk 10, solver backend = pallas_v1 (round-3 kernel)

Each program is wrapped in the fault detector; a worker crash is RECORDED
(program, config, repeat index) and the script moves on after a backend
re-init, so one run produces the full isolation table. Results append to
experiments/kernel_fault_isolation_r4.jsonl.

Requires: artifacts/smoke_posttrain_state (posttrain epoch-0 params) and
the round-2/3 dataset (artifacts/smoke_ref.npz or /tmp/smoke_ref_raw).
"""
import json
import logging
import os
import time

import numpy as np
import jax
import jax.numpy as jnp

logging.basicConfig(level=logging.INFO)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
t0 = time.time()


def tick(msg):
    print(f"[{time.time()-t0:7.1f}s] {msg}", flush=True)


from safediffcon_tpu.core.train import make_optimizer
from safediffcon_tpu.tasks.smoke import (
    SmokeConformalConfig, SmokeDataset, SmokePipeline,
)
from safediffcon_tpu.tasks.smoke.data import RESCALER
from safediffcon_tpu.tasks.smoke.pipeline import init_params
from safediffcon_tpu.utils import faults
from safediffcon_tpu.utils.checkpoint import load_phase_state

OUT = os.path.join(os.path.dirname(__file__), "kernel_fault_isolation_r4.jsonl")
STATE = os.environ.get("SMOKE_PT_STATE", "/root/repo/artifacts/smoke_posttrain_state")
RAW_DIR = "/tmp/smoke_ref_raw"
REPEATS = int(os.environ.get("ISO_REPEATS", 2))
PROGRAMS = os.environ.get("ISO_PROGRAMS", "P1,P2,P3,P4,P5").split(",")


def record(rec):
    rec["t"] = round(time.time() - t0, 1)
    print("RESULT " + json.dumps(rec), flush=True)
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")


def load_split(split, n=None):
    raw = np.asarray(np.load(os.path.join(RAW_DIR, f"{split}_data.npy"),
                             mmap_mode="r")[: n or None])
    return SmokeDataset(data=(raw / RESCALER).astype(np.float32, copy=False),
                        raw=raw)


def run_guarded(name, cfgrec, fn):
    for rep in range(REPEATS):
        try:
            t1 = time.time()
            out = fn(rep)
            record({"program": name, **cfgrec, "repeat": rep, "ok": True,
                    "seconds": round(time.time() - t1, 1),
                    "out": out})
        except Exception as e:  # noqa: BLE001
            is_fault = faults.is_device_fault(e)
            record({"program": name, **cfgrec, "repeat": rep, "ok": False,
                    "device_fault": is_fault,
                    "error": str(e).splitlines()[0][:300]})
            if not is_fault:
                raise
            tick("worker fault — reinitializing backend and continuing")
            time.sleep(20)
            faults.reinit_backend()
            return False  # pipeline objects hold dead constants; caller rebuilds
    return True


def main():
    tick(f"devices: {jax.devices()}")
    cal = load_split("cal")
    test = load_split("test")
    tick(f"splits loaded: cal={len(cal.data)} test={len(test.data)}")

    params_host = None

    def get_pipe(cal_chunk, backend):
        """Fresh pipeline (rebuilt after any backend re-init) + the
        posttrain epoch-0 params restored once as HOST arrays."""
        nonlocal params_host
        # exact backward-phase configuration (2d/scripts/finetune.sh):
        # alpha .01, ratio 495, w_safe 1, cal 40x1, DDIM 100, no guidance
        bconf = SmokeConformalConfig(
            alpha=0.01, standard_fixed_ratio=495.0, w_safe=1.0,
            cal_batch_size=40, num_cal_batch=1, ddim_sampling_steps=100,
            use_guidance=False, test_batch_size=5)
        pipe = SmokePipeline(bconf, compute_dtype="bfloat16",
                             finetune_set="test", cal_chunk=cal_chunk,
                             eval_chunk=10, solver_backend=backend)
        if params_host is None:
            p0 = init_params(pipe.model, jax.random.PRNGKey(0))
            restored = None
            if os.path.isdir(STATE):
                tx = make_optimizer("adam", 1e-4, betas=(0.9, 0.99),
                                    max_grad_norm=0.0)
                restored = load_phase_state(STATE, p0, tx.init(p0))
            if restored is not None:
                params_host = jax.device_get(restored[0])
                tick(f"restored posttrain epoch-{restored[3]} params, "
                     f"Q={float(restored[2]):.5f}")
            else:
                # Round-5: the durable posttrain state did not survive the
                # re-clone. Crash behavior is a property of the PROGRAM
                # (DDIM-100 UNet3D bf16 sampling scan + rollout), not of
                # the weights, so fresh-init params replay the same
                # kernels; metric values in the records are then
                # meaningless and flagged as such.
                params_host = jax.device_get(p0)
                tick(f"no phase state in {STATE} — using fresh-init params "
                     "(fault replay only; metrics not meaningful)")
        return pipe, params_host

    # P1/P2: the calibration program (no solver at all)
    for name, chunk in (("P1", 20), ("P2", 10)):
        if name not in PROGRAMS:
            continue
        tick(f"{name}: backward calibration, chunk {chunk}")
        pipe, params = get_pipe(chunk, "xla")
        run_guarded(
            name, {"cal_chunk": chunk, "solver": "none (cal has no solve)"},
            lambda rep: {"Q": float(pipe.calibrate(
                params, cal, jnp.zeros(()), jax.random.PRNGKey(100 + rep)))},
        )

    # P3-P5: the eval program (sampler + solver rollout), solver backend A/B
    for name, backend in (("P3", "xla"), ("P4", "pallas"), ("P5", "pallas_v1")):
        if name not in PROGRAMS:
            continue
        tick(f"{name}: unguided eval chunk 10, solver={backend}")
        pipe, params = get_pipe(10, backend)
        run_guarded(
            name, {"eval_chunk": 10, "solver": backend},
            lambda rep: {k: float(v) for k, v in pipe.evaluate(
                params, test, jnp.asarray(0.5256),
                jax.random.PRNGKey(200 + rep), guided=False).items()},
        )

    tick("isolation sweep complete")


if __name__ == "__main__":
    main()
