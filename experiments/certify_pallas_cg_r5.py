"""Round-5 on-chip certification of the Pallas pressure-CG kernels
(VERDICT r4 weak #2: v2 had never executed on real TPU; the round-1
"2.17x" claim belonged to v1, the round-3 suspect).

Runs on the REAL chip (no interpret mode):
  1. correctness: pressure_solve_pallas v1 and v2 vs the XLA matrix-free
     CG on identical masked divergence fields (both to 1e-6), batch 8
  2. stability: 20 repeated v2 solves (the round-3 faults appeared under
     repetition)
  3. speed: per-solve wall-clock xla vs v1 vs v2 at batch 8 and 40

Appends one JSON line per measurement to
experiments/pallas_cg_certification_r5.jsonl.
"""
import json
import os
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

from safediffcon_tpu.ops.pressure_cg import pressure_solve_pallas
from safediffcon_tpu.solvers import smoke as S

OUT = os.path.join(os.path.dirname(__file__), "pallas_cg_certification_r5.jsonl")
t0 = time.time()


def record(rec):
    rec["t"] = round(time.time() - t0, 1)
    print("RESULT " + json.dumps(rec), flush=True)
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")


def main():
    print("devices:", jax.devices(), flush=True)
    masks = S.build_masks()
    rng = np.random.default_rng(0)

    for batch in (8, 40):
        v = jnp.asarray(rng.normal(size=(batch, S.N, S.N, 2)) * 0.5,
                        jnp.float32) * masks.velocity_mask
        div = S.divergence(v)

        sols = {}
        times = {}
        for name, fn in (
            ("xla", lambda d: S.pressure_solve(masks, d, 1e-6, 500)),
            ("pallas_v1", lambda d: pressure_solve_pallas(
                masks, d, accuracy=1e-6, max_iter=500, variant="v1")),
            ("pallas_v2", lambda d: pressure_solve_pallas(
                masks, d, accuracy=1e-6, max_iter=500, variant="v2")),
        ):
            f = jax.jit(fn)
            try:
                p = f(div)
                jax.block_until_ready(p)
                reps = 10
                t1 = time.time()
                for _ in range(reps):
                    p = f(div)
                jax.block_until_ready(p)
                dt = (time.time() - t1) / reps
                sols[name] = np.asarray(p)
                times[name] = dt
                record({"check": "solve", "batch": batch, "backend": name,
                        "sec_per_solve": round(dt, 4), "ok": True})
            except Exception as e:  # noqa: BLE001
                record({"check": "solve", "batch": batch, "backend": name,
                        "ok": False, "error": str(e).splitlines()[0][:300]})

        if "xla" in sols:
            for name in ("pallas_v1", "pallas_v2"):
                if name in sols:
                    diff = float(np.max(np.abs(sols[name] - sols["xla"])))
                    rel = diff / (float(np.max(np.abs(sols["xla"]))) + 1e-12)
                    record({"check": "equality_vs_xla", "batch": batch,
                            "backend": name, "max_abs_diff": diff,
                            "max_rel_diff": rel,
                            # both stop at |r|<1e-6, so solutions agree to
                            # the CG tolerance, not machine eps
                            "pass": bool(rel < 1e-3)})
        if times:
            record({"check": "speedup", "batch": batch,
                    **{f"{k}_vs_xla": round(times["xla"] / v, 2)
                       for k, v in times.items() if "xla" in times}})

    # stability soak: 20 fresh v2 solves (new fields each time)
    fails = 0
    f2 = jax.jit(lambda d: pressure_solve_pallas(masks, d, accuracy=1e-6,
                                                 max_iter=500, variant="v2"))
    for i in range(20):
        v = jnp.asarray(rng.normal(size=(8, S.N, S.N, 2)) * 0.5,
                        jnp.float32) * masks.velocity_mask
        try:
            jax.block_until_ready(f2(S.divergence(v)))
        except Exception as e:  # noqa: BLE001
            fails += 1
            record({"check": "soak", "iter": i, "ok": False,
                    "error": str(e).splitlines()[0][:300]})
    record({"check": "soak", "iters": 20, "failures": fails,
            "ok": fails == 0})
    print("CERTIFY_PALLAS_DONE", flush=True)


if __name__ == "__main__":
    main()
