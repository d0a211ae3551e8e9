"""KSTAR 0-D plasma surrogate solver in pure JAX.

TPU-native re-design of the reference's Keras-driven stateful solver
(reference: tokamak/kstar_solver.py:123-428, tokamak/common/model_structure.py):
the dense/LSTM surrogate ensembles become weight pytrees applied by pure
functions, the 121-step rollout is one `lax.scan`, and whole batches of
trajectories run per device via `vmap` — replacing the reference's one
Keras `.predict` call per step per sample (its hottest loop,
tokamak/utils/metrics.py:78-80).

Numerical semantics faithfully reproduced:
  - only `best_model0` of each ensemble contributes (the reference resets
    every ensemble to n_model_box=1, kstar_solver.py:156-162);
  - the LSTM uses TF2-default recurrent sigmoid (the runtime REBUILDS the
    net via model_structure.py:67-79 with default activations, overriding
    the saved 'hard_sigmoid' config);
  - actuator values are quantized to 1e-3 via trunc(v * 1000)/1000
    (i2f/f2i, kstar_solver.py:111-117);
  - the rolling (10, 18) LSTM buffer shifts inputs before and states after
    each prediction (kstar_solver.py:229-258).
"""
from __future__ import annotations

import os
from typing import Dict, NamedTuple, Tuple

import numpy as np
import jax
import jax.numpy as jnp

DEFAULT_WEIGHTS = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tasks", "tokamak", "assets", "kstar_weights.npz",
)

# --- physical constants of the reference setup (kstar_solver.py:49-105) ----
YEAR_IN = 2021.0
SEQ_LEN = 10
NT_ACTIONS = 121  # action steps; outputs have 122 rows
LOW_ACTION = np.array([0.3, 0.0, 0.0, 0.0, 1.6, 0.15, 0.5, 1.265, 2.14])
HIGH_ACTION = np.array([0.8, 1.75, 1.75, 1.5, 1.95, 0.5, 0.85, 1.36, 2.3])
LOW_TARGET = np.array([0.8, 4.0, 0.80])
HIGH_TARGET = np.array([2.1, 7.0, 1.05])
RAND_TARGET_MINS = np.array([1.06, 4.6, 0.85])
RAND_TARGET_MAXS = np.array([1.84, 6.4, 1.00])
TARGET_INIT = np.array([1.45, 5.5, 0.925])
LOOKBACK = 3

# input vector layout (input_params order, kstar_solver.py:78-86):
# 0 Ip, 1 Bt, 2 GW.frac, 3 Pnb1a, 4 Pnb1b, 5 Pnb1c, 6 Pec2, 7 Pec3,
# 8 Zec2, 9 Zec3, 10 In.Mid, 11 Out.Mid, 12 Elon, 13 Up.Tri, 14 Lo.Tri
INPUT_INIT = np.array(
    [0.5, 1.8, 0.33, 1.5, 1.5, 0.5, 0.0, 0.0, 0.0, 0.0, 1.32, 2.22, 1.7, 0.3, 0.75]
)
# action i writes input index ACTION_TO_INPUT[i] (kstar_solver.py:375)
ACTION_TO_INPUT = np.array([0, 3, 4, 5, 12, 13, 14, 10, 11])

# normalization constants (model_structure.py:85-88,100-106,141-142)
NN_YMEAN = np.array([1.22379703, 5.2361062, 1.64438005, 1.12040048])
NN_YSTD = np.array([0.72255576, 1.5622809, 0.96563557, 0.23868018])
LSTM_YMEAN = np.array([1.4361666, 5.275876, 1.534538, 1.1268075])
LSTM_YSTD = np.array([0.7294007, 1.5010427, 0.6472052, 0.2331879])
BPW_YMEAN = np.array([1.02158800e00, 1.87408512e05])
BPW_YSTD = np.array([6.43390272e-01, 1.22543529e05])


def quantize(v):
    """i2f(f2i(v)): truncate toward zero at 1e-3 (kstar_solver.py:111-117).

    All quantized quantities here are non-negative, so trunc == floor; done
    in float64 on host constants, float32 on traced values (the reference
    truncates python floats — differences are confined to exact .001
    boundaries).
    """
    return jnp.trunc(v * 1000.0) / 1000.0


_INPUT_INIT_Q = np.trunc(INPUT_INIT * 1000.0) / 1000.0


def load_kstar_params(path: str = DEFAULT_WEIGHTS) -> Dict:
    """Load the converted weight archive into a nested pytree of arrays."""
    flat = np.load(path)
    tree: Dict = {}
    for k in flat.files:
        parts = k.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(flat[k])
    return tree


# ---------------------------------------------------------------------------
# Network forward functions
# ---------------------------------------------------------------------------

def _bn(w, x):
    # Keras BatchNormalization inference transform, eps 1e-3
    return (x - w["mean"]) / jnp.sqrt(w["var"] + 1e-3) * w["gamma"] + w["beta"]


def _dense(w, x):
    return x @ w["kernel"] + w["bias"]


def mlp_forward(w: Dict, x: jnp.ndarray, n_dense: int) -> jnp.ndarray:
    """BN -> [Dense sigmoid -> BN] x (n-1) -> Dense linear
    (kstar_nn / bpw_nn / k2rz topology, model_structure.py + saved configs)."""
    h = _bn(w["bn0"], x)
    for i in range(n_dense - 1):
        h = jax.nn.sigmoid(_dense(w[f"dense{i}"], h))
        h = _bn(w[f"bn{i+1}"], h)
    return _dense(w[f"dense{n_dense-1}"], h)


def _lstm_layer(w: Dict, xs: jnp.ndarray) -> jnp.ndarray:
    """Run one Keras-layout LSTM over (T, F); returns the (T, U) sequence.

    Gate order i,f,c,o along the 4U axis; activation tanh, recurrent
    sigmoid (TF2 defaults used by the reference's runtime rebuild)."""
    units = w["recurrent"].shape[0]

    def cell(carry, x):
        h, c = carry
        z = x @ w["kernel"] + h @ w["recurrent"] + w["bias"]
        i, f, g, o = jnp.split(z, 4, axis=-1)
        c = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
        h = jax.nn.sigmoid(o) * jnp.tanh(c)
        return (h, c), h

    init = (jnp.zeros((units,)), jnp.zeros((units,)))
    _, hs = jax.lax.scan(cell, init, xs)
    return hs


def lstm_forward(w: Dict, x_seq: jnp.ndarray) -> jnp.ndarray:
    """kstar_v220505 forward on one (SEQ_LEN, 18) buffer -> (4,) raw output.

    BN -> LSTM(100, seq) -> BN -> LSTM(100, last) -> BN -> Dense(50, sigmoid)
    -> BN -> Dense(4) (model_structure.py:67-79 with [100,100],[50,4])."""
    h = _bn(w["bn0"], x_seq)
    h = _lstm_layer(w["lstm0"], h)
    h = _bn(w["bn1"], h)
    h = _lstm_layer(w["lstm1"], h)[-1]
    h = _bn(w["bn2"], h)
    h = jax.nn.sigmoid(_dense(w["dense0"], h))
    h = _bn(w["bn3"], h)
    return _dense(w["dense1"], h)


def rl_policy_forward(w: Dict, obs: jnp.ndarray) -> jnp.ndarray:
    """SB2 MLP policy: normalize obs, relu fc stack, tanh head, denormalize
    to action bounds (model_structure.py:178-204 with bavg=0)."""
    low_state = jnp.asarray(
        np.concatenate([np.concatenate([LOW_ACTION, LOW_TARGET])] * LOOKBACK + [LOW_TARGET])
    )
    high_state = jnp.asarray(
        np.concatenate([np.concatenate([HIGH_ACTION, HIGH_TARGET])] * LOOKBACK + [HIGH_TARGET])
    )
    h = 2.0 * (obs - low_state) / (high_state - low_state) - 1.0
    n_layers = int(w["n_layers"])
    for i in range(n_layers):
        h = jax.nn.relu(_dense(w[f"fc{i}"], h))
    y = jnp.tanh(_dense(w["out"], h))
    return 0.5 * (jnp.asarray(HIGH_ACTION) - jnp.asarray(LOW_ACTION)) * (y + 1.0) + jnp.asarray(LOW_ACTION)


# ---------------------------------------------------------------------------
# Solver stepping
# ---------------------------------------------------------------------------

class SolverState(NamedTuple):
    buffer: jnp.ndarray  # (SEQ_LEN, 18) LSTM rolling buffer
    inputs: jnp.ndarray  # (15,) quantized actuator vector
    outputs: jnp.ndarray  # (8,) last [βn, βp, h89, h98, q95, q0, li, wmhd]


def _lstm_input_row(inputs: jnp.ndarray) -> jnp.ndarray:
    """Columns 4..16 of the LSTM buffer from the actuator vector
    (kstar_solver.py:210-227): [Ip, Bt, GW, Elon, UpTri, LoTri, InMid,
    OutMid, Pnb1a, Pnb1b, Pnb1c, Pec2+Pec3, InMid>1.265] + year."""
    row = jnp.stack(
        [
            inputs[0], inputs[1], inputs[2], inputs[12], inputs[13], inputs[14],
            inputs[10], inputs[11], inputs[3], inputs[4], inputs[5],
            inputs[6] + inputs[7],
            jnp.where(inputs[10] > 1.265 + 1e-4, 1.0, 0.0),
            jnp.asarray(YEAR_IN),
        ]
    )
    return row


def _bpw_and_h(params, inputs, bn, q95_wmhd_needed=True):
    """βp/wmhd prediction + h89/h98 estimates (kstar_solver.py:268-346)."""
    rgeo = 0.5 * (inputs[10] + inputs[11])
    amin = 0.5 * (inputs[11] - inputs[10])
    x = jnp.stack(
        [bn, inputs[0], inputs[1], rgeo, amin, inputs[12], inputs[13], inputs[14]]
    )
    y = mlp_forward(params["bpw"], x, 3) * jnp.asarray(BPW_YSTD) + jnp.asarray(BPW_YMEAN)
    beta_p, wmhd = y[0], y[1]

    ip, bt, fgw = inputs[0], inputs[1], inputs[2]
    ptot = jnp.maximum(
        inputs[3] + inputs[4] + inputs[5] + inputs[6] + inputs[7], 1e-1
    )
    k = inputs[12]
    ne = fgw * 10.0 * (ip / (jnp.pi * amin**2))
    m = 2.0
    tau89 = (
        0.038 * ip**0.85 * bt**0.2 * ne**0.1 * ptot**-0.5
        * rgeo**1.5 * k**0.5 * (amin / rgeo) ** 0.3 * m**0.5
    )
    tau98 = (
        0.0562 * ip**0.93 * bt**0.15 * ne**0.41 * ptot**-0.69
        * rgeo**1.97 * k**0.78 * (amin / rgeo) ** 0.58 * m**0.19
    )
    h89 = 1e-6 * wmhd / ptot / tau89
    h98 = 1e-6 * wmhd / ptot / tau98
    return beta_p, wmhd, h89, h98


def steady_init(params: Dict) -> SolverState:
    """First solver step from the fixed initial actuators via the dense
    surrogate (kstar_solver.py:174-227,389-400)."""
    inputs = jnp.asarray(_INPUT_INIT_Q, dtype=jnp.float32)
    rgeo = 0.5 * (inputs[10] + inputs[11])
    amin = 0.5 * (inputs[11] - inputs[10])
    x = jnp.concatenate(
        [
            inputs[:2],  # Ip, Bt
            inputs[3:10],  # Pnb1a..Zec3
            jnp.stack([rgeo, amin]),
            inputs[12:15],  # Elon, UpTri, LoTri
            jnp.stack(
                [
                    jnp.where(inputs[10] > 1.265 + 1e-4, 1.0, 0.0),
                    inputs[2],
                    jnp.asarray(YEAR_IN),
                ]
            ),
        ]
    )
    y = mlp_forward(params["nn"], x, 4) * jnp.asarray(NN_YSTD) + jnp.asarray(NN_YMEAN)
    bn_, q95, q0, li = y[0], y[1], y[2], y[3]

    row = _lstm_input_row(inputs)
    buffer = jnp.concatenate(
        [jnp.broadcast_to(y, (SEQ_LEN, 4)), jnp.broadcast_to(row, (SEQ_LEN, 14))],
        axis=1,
    )

    beta_p, wmhd, h89, h98 = _bpw_and_h(params, inputs, bn_)
    outputs = jnp.stack([bn_, beta_p, h89, h98, q95, q0, li, wmhd])
    return SolverState(buffer=buffer, inputs=inputs, outputs=outputs)


def apply_action(state: SolverState, action: jnp.ndarray) -> SolverState:
    """Clip + quantize the 9 actuator commands into the input vector
    (kstar_solver.py:360-380)."""
    a = quantize(jnp.clip(action, jnp.asarray(LOW_ACTION), jnp.asarray(HIGH_ACTION)))
    inputs = state.inputs.at[jnp.asarray(ACTION_TO_INPUT)].set(a)
    return state._replace(inputs=inputs)


def lstm_step(params: Dict, state: SolverState) -> SolverState:
    """One non-steady solver step (kstar_solver.py:229-267)."""
    buf = state.buffer
    row = _lstm_input_row(state.inputs)
    # shift input columns up, write new actuators into the last row
    buf = buf.at[:-1, 4:].set(buf[1:, 4:])
    buf = buf.at[-1, 4:].set(row)
    y = lstm_forward(params["lstm"], buf) * jnp.asarray(LSTM_YSTD) + jnp.asarray(LSTM_YMEAN)
    # shift state columns after prediction
    buf = buf.at[:-1, :4].set(buf[1:, :4])
    buf = buf.at[-1, :4].set(y)

    bn_, q95, q0, li = y[0], y[1], y[2], y[3]
    beta_p, wmhd, h89, h98 = _bpw_and_h(params, state.inputs, bn_)
    outputs = jnp.stack([bn_, beta_p, h89, h98, q95, q0, li, wmhd])
    return SolverState(buffer=buf, inputs=state.inputs, outputs=outputs)


def simulate(params: Dict, actions: jnp.ndarray) -> jnp.ndarray:
    """Roll one action sequence (121, 9) -> outputs (122, 8)
    ([βn, βp, h89, h98, q95, q0, li, wmhd] per step, kstar_solver.py:389-428)."""
    state0 = steady_init(params)

    def body(state, action):
        state = apply_action(state, action)
        state = lstm_step(params, state)
        return state, state.outputs

    _, outs = jax.lax.scan(body, state0, actions)
    return jnp.concatenate([state0.outputs[None], outs], axis=0)


def simulate_batch(params: Dict, actions: jnp.ndarray) -> jnp.ndarray:
    """(B, 121, 9) -> (B, 122, 8); vmapped replacement for the reference's
    sequential per-sample Keras rollout (tokamak/utils/metrics.py:78-80)."""
    return jax.vmap(lambda a: simulate(params, a))(actions)


# ---------------------------------------------------------------------------
# Closed-loop data generation (RL policy in the loop)
# ---------------------------------------------------------------------------

def closed_loop_rollout(
    params: Dict, rng: jax.Array
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """One random-target closed-loop trajectory
    (reference: tokamak/kstar_data_generator_random_target.py:433-520).

    Returns (outputs (122, 8), actions (121, 9), targets (122, 3)). The RL
    policy observes LOOKBACK action+state histories plus the current
    target; targets re-randomize every 3 "seconds" (30 steps).
    """
    state0 = steady_init(params)
    n_targets = 4  # steps 0-30, 31-60, 61-90, 91-120
    keys = jax.random.split(rng, n_targets)
    targets = quantize(
        jax.random.uniform(rng, (n_targets, 3))
        * (jnp.asarray(RAND_TARGET_MAXS) - jnp.asarray(RAND_TARGET_MINS))
        + jnp.asarray(RAND_TARGET_MINS)
    )
    del keys

    # per-step target index: step 0 -> 0, then ((i-1)//30 capped)
    step_target = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32),
         jnp.clip((jnp.arange(NT_ACTIONS, dtype=jnp.int32)) // 30, 0, n_targets - 1)]
    )[:NT_ACTIONS]

    hist0 = jnp.broadcast_to(
        jnp.concatenate([jnp.asarray(LOW_ACTION), jnp.asarray(TARGET_INIT)]),
        (LOOKBACK, 12),
    )

    def body(carry, target_idx):
        state, hist, prev_action = carry
        target = targets[target_idx]
        obs = jnp.concatenate([hist.reshape(-1), target])
        action = rl_policy_forward(params["rl"], obs)
        state = apply_action(state, action)
        state = lstm_step(params, state)
        # history rows: [action(9), βp, q95, li] (kstar_solver.py:311-316)
        new_row = jnp.concatenate(
            [action, jnp.stack([state.outputs[1], state.outputs[4], state.outputs[6]])]
        )
        hist = jnp.concatenate([hist[1:], new_row[None]], axis=0)
        return (state, hist, action), (state.outputs, action, target)

    (_, _, _), (outs, actions, tgts) = jax.lax.scan(
        body, (state0, hist0, jnp.asarray(LOW_ACTION, jnp.float32)), step_target
    )
    outputs = jnp.concatenate([state0.outputs[None], outs], axis=0)
    targets_out = jnp.concatenate([tgts[:1], tgts], axis=0)
    return outputs, actions, targets_out


def closed_loop_batch(params: Dict, rng: jax.Array, n: int):
    """Generate n closed-loop trajectories in parallel (replaces the
    reference's ThreadPool-of-subprocesses data generator,
    tokamak/data_parallel_generate.py:17-33)."""
    keys = jax.random.split(rng, n)
    return jax.vmap(lambda k: closed_loop_rollout(params, k))(keys)


# ---------------------------------------------------------------------------
# Plasma boundary shape predictor (visualization utility)
# ---------------------------------------------------------------------------

def k2rz_forward(params: Dict, ip, bt, betap, rin, rout, k, du, dl,
                 n_theta: int = 64, xpt_correction: bool = True,
                 closed_surface: bool = True):
    """Plasma boundary (R, Z) contour from 0-D parameters
    (reference: tokamak/common/model_structure.py:5-38, k2rz model0).

    Returns numpy arrays (rbdry, zbdry); the x-point correction mutates the
    extremal contour points exactly as the reference post-processing does.
    """
    x = jnp.asarray([ip, bt, betap, rin, rout, k, du, dl], dtype=jnp.float32)
    y = np.asarray(mlp_forward(params["k2rz"], x, 4))
    rbdry, zbdry = y[:n_theta].copy(), y[n_theta:].copy()
    if xpt_correction:
        rgeo = 0.5 * (rbdry.max() + rbdry.min())
        amin = 0.5 * (rbdry.max() - rbdry.min())
        if du <= dl:
            rx = rgeo - amin * dl
            zx = zbdry.max() - 2.0 * k * amin
            rx2 = rgeo - amin * du
            rbdry[np.argmin(zbdry)] = rx
            zbdry[np.argmin(zbdry)] = zx
            rbdry[np.argmax(zbdry)] = rx2
        else:
            rx = rgeo - amin * du
            zx = zbdry.min() + 2.0 * k * amin
            rx2 = rgeo - amin * dl
            rbdry[np.argmax(zbdry)] = rx
            zbdry[np.argmax(zbdry)] = zx
            rbdry[np.argmin(zbdry)] = rx2
    if closed_surface:
        rbdry = np.append(rbdry, rbdry[0])
        zbdry = np.append(zbdry, zbdry[0])
    return rbdry, zbdry
