"""Same-CPU head-to-head: reference Keras KSTAR surrogate vs our JAX rollout.

Drives the reference's ACTUAL `KSTARSolver.simulate` (tokamak/
kstar_solver.py:389-428 — per-step Keras `.predict` calls through the
rebuilt LSTM/NN/BPW stacks of common/model_structure.py, at the
reference's own production ensemble setting n_model_box=1) and our
`solvers/kstar.py::simulate_batch` (one vmapped lax.scan) on the SAME
host CPU, using the golden action sequences whose outputs already pin
numerical parity (tests/golden/kstar_reference_rollouts.npz, <1e-4 rel).

Keras-3 compatibility shims (loading only, no behavioral change): weight
files copied to /tmp with an .h5 suffix; `models.load_model` /
`load_custom_model` redirected to the suffixed copies. This mirrors the
round-1 golden-generation recipe (tools/convert_kstar_weights.py
docstring).

Output: experiments/bench_reference_kstar.json
"""
import json
import os
import shutil
import sys
import time

import numpy as np

GOLDEN = "/root/repo/tests/golden/kstar_reference_rollouts.npz"
OUT = os.path.join(os.path.dirname(__file__), "bench_reference_kstar.json")
REPEATS = int(os.environ.get("BENCH_REPEATS", 3))


def _h5ify(path):
    """Copy a suffix-less Keras weight file to a cached /tmp .h5 twin."""
    dst = "/tmp/kstar_h5" + path.replace("/", "_") + ".h5"
    if not os.path.exists(dst):
        os.makedirs(os.path.dirname(dst) or "/", exist_ok=True)
        shutil.copy(path, dst)
    return dst


def _rebuild_mlp_from_h5(path):
    """Rebuild a BN->[Dense(sigmoid)->BN]xN->Dense(linear) Sequential from
    the h5's own layer list and load the weights positionally — the same
    stack the reference's models actually are (see
    tools/convert_kstar_weights.py::export_mlp); Keras 3's load_model
    deserializes these keras-2 files with a broken input rank, so the
    rebuild mirrors how the reference runtime rebuilds its LSTM
    (common/model_structure.py::load_custom_model)."""
    import h5py  # noqa: PLC0415
    from tensorflow import keras  # noqa: PLC0415

    layers = []
    with h5py.File(path, "r") as f:
        g = f["model_weights"]
        for lname in [n.decode() for n in g.attrs["layer_names"]]:
            lg = g[lname]
            wnames = [n.decode() for n in lg.attrs["weight_names"]]
            if wnames:
                layers.append((lname, [np.asarray(lg[w]) for w in wnames]))
    last_dense = max(i for i, (_, a) in enumerate(layers) if len(a) == 2)
    model = keras.Sequential()
    model.add(keras.layers.Input((layers[0][1][0].shape[0],)))
    for i, (lname, arrs) in enumerate(layers):
        if len(arrs) == 4:
            model.add(keras.layers.BatchNormalization())
        elif len(arrs) == 2:
            act = "linear" if i == last_dense else "sigmoid"
            model.add(keras.layers.Dense(arrs[0].shape[1], activation=act))
        else:
            raise ValueError(f"unexpected layer {lname}")
    model.set_weights([w for (_, arrs) in layers for w in arrs])
    return model


def load_reference_solver():
    sys.argv = ["/root/reference/tokamak/dummy.py"]  # base_path resolution
    sys.path.insert(0, "/root/reference/tokamak")
    import common.model_structure as MS  # noqa: PLC0415

    MS.models.load_model = lambda p, **kw: _rebuild_mlp_from_h5(_h5ify(p))
    orig_lcm = MS.load_custom_model
    MS.load_custom_model = (
        lambda ishape, lstms, denses, p: orig_lcm(ishape, lstms, denses,
                                                  _h5ify(p)))
    import kstar_solver as KS  # noqa: PLC0415

    # the reference's own runtime ensemble setting is n_model_box=1
    # (kstar_solver.py:45,156-162); loading only model0 reproduces exactly
    # what simulate() executes while skipping dead ensemble-member loads
    KS.max_models = 1
    KS.max_shape_models = 1
    return KS


def main():
    z = np.load(GOLDEN)
    actions = np.stack([z[f"actions_{i}"] for i in range(3)])  # (3, 121, 9)
    B = actions.shape[0]

    # --- ours: one vmapped jitted scan on CPU ---
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from safediffcon_tpu.solvers.kstar import load_kstar_params, simulate_batch

    params = load_kstar_params()
    run = jax.jit(lambda a: simulate_batch(params, a))
    aj = jnp.asarray(actions, jnp.float32)
    t0 = time.perf_counter()
    out = jax.block_until_ready(run(aj))
    first = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(REPEATS):
        out = jax.block_until_ready(run(aj))
    ours_s = (time.perf_counter() - t0) / REPEATS / B
    print(f"ours: compile+first {first:.2f}s; steady {ours_s*1e3:.1f} ms/sample "
          f"({B} samples vmapped)", flush=True)

    # --- reference: sequential Keras predict loops ---
    KS = load_reference_solver()
    per_sample = []
    for b in range(B):
        solver = KS.KSTARSolver(random_seed=0)
        t0 = time.perf_counter()
        ref_out = solver.simulate(actions[b])
        per_sample.append(time.perf_counter() - t0)
        print(f"reference sample {b}: {per_sample[-1]:.2f}s "
              f"({per_sample[-1]/121*1e3:.0f} ms/step)", flush=True)
        # cross-check parity against the stored golden while we're here
        rel = np.max(np.abs(ref_out - z[f"outputs_{b}"]) /
                     (np.abs(z[f"outputs_{b}"]) + 1e-6))
        print(f"  vs stored golden: max rel diff {rel:.2e}", flush=True)
    ref_s = float(np.mean(per_sample))

    results = {
        "batch": B, "steps": 121, "host": "same CPU, single process",
        "ours_s_per_sample": ours_s,
        "ours_compile_plus_first_s": first,
        "reference_s_per_sample": ref_s,
        "speedup": ref_s / ours_s,
        "note": "reference at its production n_model_box=1; ours is the "
                "vmapped lax.scan whose outputs match the reference to "
                "<1e-4 rel (tests/test_kstar_solver.py)",
    }
    print("SUMMARY", json.dumps(results))
    with open(OUT, "w") as f:
        json.dump(results, f, indent=1, sort_keys=True)


if __name__ == "__main__":
    main()
