"""Convert the KSTAR surrogate Keras h5 checkpoints + SB2 RL policy zip into
one flat .npz consumed by `safediffcon_tpu.solvers.kstar`.

The reference drives Keras models at runtime (reference:
tokamak/common/model_structure.py, tokamak/kstar_solver.py:123-145); we
convert the weights ONCE into plain arrays so the framework needs no
TensorFlow. Only `best_model0` of each ensemble is exported: the reference
resets every ensemble to n_model_box=1 before simulating
(tokamak/kstar_solver.py:156-162), so model0 alone defines its behavior.

Layer order inside each h5 follows the `layer_names` attribute; Keras
`load_weights` maps saved weighted layers to model layers positionally,
which is how the rebuilt LSTM (tokamak/common/model_structure.py:67-79)
actually receives them. Note the rebuild uses TF2's default
recurrent_activation='sigmoid', NOT the 'hard_sigmoid' recorded in the
saved config — the JAX port matches the rebuilt (runtime) behavior.

Usage: python tools/convert_kstar_weights.py [src_root] [out.npz]
"""
import io
import json
import sys
import zipfile

import h5py
import numpy as np

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/reference/tokamak/weights"
OUT = (
    sys.argv[2]
    if len(sys.argv) > 2
    else "safediffcon_tpu/tasks/tokamak/assets/kstar_weights.npz"
)


def read_h5_weights(path):
    """Return {layer_name: [arrays in saved order]} for weighted layers,
    ordered by the h5 `layer_names` attribute."""
    out = []
    with h5py.File(path, "r") as f:
        g = f["model_weights"]
        for lname in [n.decode() for n in g.attrs["layer_names"]]:
            lg = g[lname]
            wnames = [n.decode() for n in lg.attrs["weight_names"]]
            if not wnames:
                continue
            out.append((lname, [np.asarray(lg[w]) for w in wnames]))
    return out


def export_bn(store, prefix, arrs):
    # Keras BatchNormalization weight order: gamma, beta, moving_mean, moving_var
    gamma, beta, mean, var = arrs
    store[f"{prefix}/gamma"] = gamma
    store[f"{prefix}/beta"] = beta
    store[f"{prefix}/mean"] = mean
    store[f"{prefix}/var"] = var


def export_dense(store, prefix, arrs):
    store[f"{prefix}/kernel"], store[f"{prefix}/bias"] = arrs


def export_lstm(store, prefix, arrs):
    # Keras LSTM weight order: kernel (in, 4u), recurrent_kernel (u, 4u), bias (4u)
    # gate order along the 4u axis: i, f, c, o
    store[f"{prefix}/kernel"], store[f"{prefix}/recurrent"], store[f"{prefix}/bias"] = arrs


def export_mlp(store, model_prefix, path, n_dense):
    """BN/Dense alternating stacks (kstar_nn, bpw_nn, k2rz)."""
    layers = read_h5_weights(path)
    bn_i = dense_i = 0
    for lname, arrs in layers:
        if len(arrs) == 4:
            export_bn(store, f"{model_prefix}/bn{bn_i}", arrs)
            bn_i += 1
        elif len(arrs) == 2:
            export_dense(store, f"{model_prefix}/dense{dense_i}", arrs)
            dense_i += 1
        else:
            raise ValueError(f"unexpected layer {lname} with {len(arrs)} arrays")
    assert dense_i == n_dense, f"{model_prefix}: expected {n_dense} dense, got {dense_i}"


def export_kstar_lstm(store, model_prefix, path):
    """The rebuilt LSTM stack (tokamak/common/model_structure.py:67-79):
    BN -> LSTM -> BN -> LSTM -> BN -> Dense(sigmoid) -> BN -> Dense.
    Saved weighted layers map positionally in layer_names order."""
    layers = read_h5_weights(path)
    kinds = []
    bn_i = lstm_i = dense_i = 0
    for lname, arrs in layers:
        if len(arrs) == 3:
            export_lstm(store, f"{model_prefix}/lstm{lstm_i}", arrs)
            kinds.append(f"lstm{lstm_i}")
            lstm_i += 1
        elif len(arrs) == 4:
            export_bn(store, f"{model_prefix}/bn{bn_i}", arrs)
            kinds.append(f"bn{bn_i}")
            bn_i += 1
        elif len(arrs) == 2:
            export_dense(store, f"{model_prefix}/dense{dense_i}", arrs)
            kinds.append(f"dense{dense_i}")
            dense_i += 1
    assert kinds == [
        "bn0", "lstm0", "bn1", "lstm1", "bn2", "dense0", "bn3", "dense1",
    ], f"unexpected lstm layer sequence {kinds}"


def export_rl_policy(store, prefix, zip_path):
    """SB2 MLP policy (tokamak/common/model_structure.py:178-204): relu fc
    layers + tanh output head, parameters stored in a numpy archive inside
    the SB2 zip."""
    zf = zipfile.ZipFile(zip_path)
    data = json.loads(zf.read("data").decode("utf-8"))
    layers = data["policy_kwargs"].get("layers", [64, 64])
    params = np.load(io.BytesIO(zf.read("parameters")))
    for i in range(len(layers)):
        store[f"{prefix}/fc{i}/kernel"] = params[f"model/pi/fc{i}/kernel:0"]
        store[f"{prefix}/fc{i}/bias"] = params[f"model/pi/fc{i}/bias:0"]
    store[f"{prefix}/out/kernel"] = params["model/pi/dense/kernel:0"]
    store[f"{prefix}/out/bias"] = params["model/pi/dense/bias:0"]
    store[f"{prefix}/n_layers"] = np.asarray(len(layers))


def main():
    store = {}
    export_mlp(store, "nn", f"{SRC}/nn/best_model0", n_dense=4)
    # NOTE: the solver loads the BASE bpw dir, not bpw/v220505
    # (tokamak/kstar_solver.py:56 joins 'weights', 'bpw').
    export_mlp(store, "bpw", f"{SRC}/bpw/best_model0", n_dense=3)
    export_mlp(store, "k2rz", f"{SRC}/k2rz/best_model0", n_dense=4)
    export_kstar_lstm(store, "lstm", f"{SRC}/lstm/v220505/best_model0")
    export_rl_policy(store, "rl", f"{SRC}/rl/rt_control/3frame_v220505/best_model.zip")
    import os

    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    np.savez_compressed(OUT, **store)
    total = sum(v.size for v in store.values() if hasattr(v, "size"))
    print(f"wrote {OUT}: {len(store)} arrays, {total} params")


if __name__ == "__main__":
    main()
