"""Tests for checkpointing and profiling utilities."""
import json
import os

import numpy as np
import jax
import jax.numpy as jnp

from safediffcon_tpu.core.train import TrainState, make_optimizer
from safediffcon_tpu.utils.checkpoint import latest_step, load_checkpoint, save_checkpoint
from safediffcon_tpu.utils.profiling import MetricsLogger, StepTimer


def test_checkpoint_roundtrip(tmp_path):
    params = {"w": jnp.arange(6.0).reshape(2, 3), "b": jnp.ones((3,))}
    tx = make_optimizer("adam", 1e-3)
    state = TrainState.create(params, tx)
    state = state.apply_gradients(jax.tree.map(jnp.ones_like, params))

    d = str(tmp_path / "ck")
    save_checkpoint(d, state, 5, Q=jnp.asarray(0.7))
    assert latest_step(d) == 5
    restored = load_checkpoint(d, 5)
    np.testing.assert_allclose(np.asarray(restored["params"]["w"]),
                               np.asarray(state.params["w"]))
    np.testing.assert_allclose(np.asarray(restored["ema_params"]["b"]),
                               np.asarray(state.ema_params["b"]))
    assert abs(float(restored["Q"]) - 0.7) < 1e-6
    assert int(restored["step"]) == 1


def test_step_timer():
    t = StepTimer(window=4)
    for _ in range(6):
        t.tick()
    assert t.steps_per_sec > 0
    assert t.count == 6


def test_metrics_logger(tmp_path):
    p = str(tmp_path / "m.jsonl")
    ml = MetricsLogger(p)
    ml.log(1, loss=0.5)
    ml.log(2, loss=0.25, lr=1e-4)
    ml.close()
    lines = [json.loads(l) for l in open(p)]
    assert lines[0]["loss"] == 0.5 and lines[1]["lr"] == 1e-4


def test_save_finetuned_roundtrip(tmp_path):
    from safediffcon_tpu.utils.checkpoint import load_checkpoint, save_finetuned

    params = {"w": jnp.arange(4.0)}
    d = str(tmp_path / "ft")
    save_finetuned(d, params, Q=jnp.asarray(1.25), step=3)
    restored = load_checkpoint(d, 3)
    np.testing.assert_allclose(np.asarray(restored["params"]["w"]), np.arange(4.0))
    assert abs(float(restored["Q"]) - 1.25) < 1e-6
