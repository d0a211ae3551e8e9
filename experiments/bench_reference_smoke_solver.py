"""Same-CPU head-to-head: reference PhiFlow smoke solver vs our JAX solver.

Drives the reference's ACTUAL vendored PhiFlow (numpy/scipy backend,
`2d/phi`, SparseCGPressureSolver at the accuracy hardcoded in
`2d/apps/evaluate_solver.py::get_envolve`) through its own
`get_envolve` + `advect` stepping — the exact per-frame work its
evaluation process pool performs per sample — and our fused
`solvers/smoke.py::evaluate_control` (jit + vmapped batch, matrix-free CG,
warm-started) on the SAME host CPU. The reference code is imported from a
/tmp copy with mechanical py3.12/modern-numpy index fixes only
(list-of-slices subscripts wrapped in tuple(); see this script's
`prepare_reference_phi`).

This gives the 2D solver a measured framework-level denominator like the
1D sampler's (experiments/bench_reference_torch.py) — independent of TPU
availability. On-chip numbers multiply our side by the TPU speedup.

Output: experiments/bench_reference_smoke_solver.json
"""
import collections
import collections.abc
import json
import os
import sys
import time
import types

collections.Iterable = collections.abc.Iterable  # 2018-era phi on py3.12

import numpy as np

B = int(os.environ.get("BENCH_B", 4))          # samples
STEPS = int(os.environ.get("BENCH_STEPS", 32))  # simulation frames
OUT = os.path.join(os.path.dirname(__file__), "bench_reference_smoke_solver.json")


def prepare_reference_phi():
    """Import the reference apps/evaluate_solver against the /tmp phi copy.

    The copy (created by the round-4 session; regenerate with the codemod
    in the git log / this docstring) only converts `x[[slice...]+...]`
    subscripts to `x[tuple([...])]` — no behavioral change.
    """
    assert os.path.exists("/tmp/phi_ref/phi"), (
        "run the codemod first: copy /root/reference/2d/phi to "
        "/tmp/phi_ref/phi and wrap list-of-slices subscripts in tuple()")
    sys.path.insert(0, "/tmp/phi_ref")
    # cache the PATCHED phi in sys.modules BEFORE the reference dir (which
    # contains the unpatched vendored copy) joins the path for `apps`
    import phi.flow  # noqa: F401, PLC0415
    import phi.math.nd  # noqa: F401, PLC0415
    import phi.solver.sparse  # noqa: F401, PLC0415

    assert phi.flow.__file__.startswith("/tmp/phi_ref"), phi.flow.__file__
    sys.path.insert(1, "/root/reference/2d")
    # evaluate_solver imports imageio (absent here) for unrelated gif debug
    sys.modules.setdefault("imageio", types.ModuleType("imageio"))
    import matplotlib

    matplotlib.use("Agg")
    from apps import evaluate_solver as ES  # noqa: PLC0415

    return ES


def bench_reference(c1, c2, init_density):
    ES = prepare_reference_phi()
    from phi.math.nd import StaggeredGrid  # the patched copy

    sim = ES.init_sim_128()
    per_sample = []
    for b in range(B):
        dens = np.tile(init_density[b].reshape(64, 1, 64, 1),
                       (1, 2, 1, 2)).reshape(128, 128, 1)
        loop_density = dens[:-1, :-1].reshape(1, 127, 127, 1)
        vel = StaggeredGrid(np.zeros((1, 128, 128, 2)))
        t0 = time.perf_counter()
        for frame in range(STEPS):
            vel = ES.get_envolve(sim=sim, pre_velocity=vel,
                                 c1=c1[b], c2=c2[b], frame=frame)
            loop_density = vel.advect(loop_density, dt=1)
        per_sample.append(time.perf_counter() - t0)
        print(f"reference sample {b}: {per_sample[-1]:.2f}s "
              f"({per_sample[-1]/STEPS*1e3:.0f} ms/frame)", flush=True)
    return float(np.mean(per_sample))


def bench_ours(c1_rec, c2_rec, init_density, accuracy):
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from safediffcon_tpu.solvers import smoke as S

    masks = S.build_masks()

    def run(dens, c1, c2):
        return S.evaluate_control(
            masks, dens, c1, c2, accuracy=accuracy, max_iter=500,
            time_scale=1, space_scale=2)

    run_j = jax.jit(run)
    dens = jnp.asarray(init_density)
    c1j = jnp.asarray(c1_rec)
    c2j = jnp.asarray(c2_rec)
    t0 = time.perf_counter()
    out = run_j(dens, c1j, c2j)
    jax.block_until_ready(out)
    compile_and_first = time.perf_counter() - t0
    t0 = time.perf_counter()
    out = run_j(dens, c1j, c2j)
    jax.block_until_ready(out)
    steady = time.perf_counter() - t0
    print(f"ours (acc {accuracy:g}): first {compile_and_first:.2f}s, "
          f"steady {steady:.2f}s for batch {B} x {STEPS} frames "
          f"({steady/B:.3f} s/sample)", flush=True)
    return steady / B, compile_and_first


def main():
    rng = np.random.default_rng(0)
    # band controls like the reference's divergent velocities (interior
    # zeroed by both implementations); record resolution 64^2, nt = STEPS
    c1 = rng.normal(scale=0.5, size=(B, STEPS, 128, 128))
    c2 = rng.normal(scale=0.5, size=(B, STEPS, 128, 128))
    init_density = np.zeros((B, 64, 64), np.float64)
    init_density[:, 14:24, 27:37] = 1.0  # the task's 10x10 source blob

    # ours consumes record-resolution controls (64^2) and upsamples
    c1_rec = c1[:, :, ::2, ::2].astype(np.float32)
    c2_rec = c2[:, :, ::2, ::2].astype(np.float32)

    results = {
        "batch": B, "steps": STEPS, "host": "same CPU, single process",
        "note": "reference side measures get_envolve (divergence_free at "
                "its hardcoded 1e-8, fresh SparseCGPressureSolver per frame "
                "exactly as 2d/apps/evaluate_solver.py does) + ONE density "
                "advect; its production solver() advects THREE density "
                "fields + bucket accounting per frame, so the reference "
                "time here is an undercount. Ours measures the FULL fused "
                "evaluate_control record assembly.",
    }
    ours_s, first = bench_ours(c1_rec, c2_rec, init_density.astype(np.float32),
                               accuracy=1e-6)
    results["ours_s_per_sample_acc1e6"] = ours_s
    results["ours_compile_plus_first_s"] = first
    ours8_s, _ = bench_ours(c1_rec, c2_rec, init_density.astype(np.float32),
                            accuracy=1e-8)
    results["ours_s_per_sample_acc1e8"] = ours8_s

    ref_s = bench_reference(c1, c2, init_density)
    results["reference_s_per_sample_acc1e8"] = ref_s
    results["speedup_same_accuracy"] = ref_s / ours8_s
    results["speedup_production"] = ref_s / ours_s
    print("SUMMARY", json.dumps(results))
    with open(OUT, "w") as f:
        json.dump(results, f, indent=1, sort_keys=True)


if __name__ == "__main__":
    main()
