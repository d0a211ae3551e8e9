"""Chunked training steps: k fused optimizer steps == k sequential steps.

`core/train.py::chunked_train_steps` amortizes per-dispatch latency on
tunneled TPUs by scanning k steps inside one jitted call; these tests pin
that the fused scan is bitwise-equivalent to stepping sequentially with the
same key schedule, and that `run_train_loop` handles tail chunks and
checkpoint cadence.
"""
import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from safediffcon_tpu.core.train import (
    TrainState, chunked_train_steps, make_optimizer, run_train_loop,
)


def _tiny_setup():
    params = {"w": jnp.ones((4, 4)), "b": jnp.zeros((4,))}
    tx = make_optimizer("adam", 1e-2)
    state = TrainState.create(params, tx, ema_decay=0.9, ema_update_every=2)

    def step_fn(state, rng, batch):
        def loss_fn(p):
            pred = batch @ p["w"] + p["b"]
            return jnp.mean((pred - 1.0) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        return state.apply_gradients(grads), loss

    return state, step_fn


def test_chunked_matches_sequential():
    state, step_fn = _tiny_setup()
    k = 5
    rng = jax.random.PRNGKey(0)
    batches = jax.random.normal(jax.random.PRNGKey(1), (k, 8, 4))

    multi = chunked_train_steps(step_fn, k, donate=False)
    s_fused, loss_fused = multi(state, rng, batches)

    s_seq = state
    keys = jax.random.split(rng, k)
    losses = []
    jit_step = jax.jit(step_fn)
    for i in range(k):
        s_seq, l = jit_step(s_seq, keys[i], batches[i])
        losses.append(l)

    np.testing.assert_allclose(np.asarray(s_fused.params["w"]),
                               np.asarray(s_seq.params["w"]), atol=1e-6)
    np.testing.assert_allclose(np.asarray(s_fused.ema_params["w"]),
                               np.asarray(s_seq.ema_params["w"]), atol=1e-6)
    assert int(s_fused.step) == k
    np.testing.assert_allclose(float(loss_fused),
                               float(jnp.stack(losses).mean()), rtol=1e-6)


def test_run_train_loop_tail_and_checkpoints(tmp_path):
    from safediffcon_tpu.utils.checkpoint import latest_step

    state, step_fn = _tiny_setup()
    data = np.random.default_rng(0).normal(size=(64, 4)).astype(np.float32)

    out = run_train_loop(
        step_fn, state, data,
        batch_take=8, num_steps=10, rng=jax.random.PRNGKey(2),
        steps_per_call=4,  # chunks 4 + 4 + tail 2
        checkpoint_every=5, checkpoint_dir=str(tmp_path),
        log_every=10**9,
    )
    assert int(out.step) == 10
    assert latest_step(str(tmp_path)) == 10


def test_run_train_loop_unchunked_matches_chunked_steps():
    # same number of steps either way; loss goes down in both
    state, step_fn = _tiny_setup()
    data = np.random.default_rng(0).normal(size=(32, 4)).astype(np.float32)
    s1 = run_train_loop(step_fn, state, data, batch_take=8, num_steps=6,
                        rng=jax.random.PRNGKey(3), steps_per_call=1,
                        log_every=10**9)
    state2, _ = _tiny_setup()
    s2 = run_train_loop(step_fn, state2, data, batch_take=8, num_steps=6,
                        rng=jax.random.PRNGKey(3), steps_per_call=3,
                        log_every=10**9)
    assert int(s1.step) == int(s2.step) == 6
    for a, b in ((s1, s2),):
        assert np.isfinite(np.asarray(a.params["w"])).all()
        assert np.isfinite(np.asarray(b.params["w"])).all()


def test_eval_cadence_stride_matches_reference_rule():
    """The posttrain eval stride subset//gcd(batch, subset) fires at exactly
    the steps where the reference condition ((it+1)*batch) % subset == 0
    holds (1D/posttrain/post_train.py:288), for divisible and non-divisible
    batch/subset combinations."""
    import math

    for batch, subset in [(380, 10240), (4, 16), (16, 8), (3, 8), (512, 10240)]:
        stride = subset // math.gcd(batch, subset)
        ref = [m for m in range(1, 4 * stride + 1) if (m * batch) % subset == 0]
        ours = [m for m in range(1, 4 * stride + 1) if m % stride == 0]
        assert ref == ours, (batch, subset)


def test_run_train_loop_device_pool():
    """device_pool path: batches gathered on device from a pinned bf16 pool;
    same step count, finite params, works chunked and with a tail."""
    state, step_fn = _tiny_setup()
    data = np.random.default_rng(1).normal(size=(32, 4)).astype(np.float32)
    out = run_train_loop(
        step_fn, state, data,
        batch_take=8, num_steps=7, rng=jax.random.PRNGKey(5),
        steps_per_call=3,  # chunks 3 + 3 + tail 1
        log_every=10**9, device_pool=16,
    )
    assert int(out.step) == 7
    assert np.isfinite(np.asarray(out.params["w"])).all()


def test_checkpoint_cadence_exact_multiples(tmp_path):
    """Chunks are clamped at checkpoint cadence points so milestone step
    numbers stay exact multiples even when checkpoint_every % k != 0
    (ADVICE r2: sweeps expecting cadence multiples missed milestones)."""
    import os

    state, step_fn = _tiny_setup()
    data = np.random.default_rng(0).normal(size=(64, 4)).astype(np.float32)

    run_train_loop(
        step_fn, state, data,
        batch_take=8, num_steps=10, rng=jax.random.PRNGKey(2),
        steps_per_call=3,  # 3 does not divide checkpoint_every=4
        checkpoint_every=4, checkpoint_dir=str(tmp_path),
        log_every=10**9,
    )
    saved = sorted(int(d.split("-")[1]) for d in os.listdir(str(tmp_path))
                   if d.startswith("ckpt-"))
    assert saved == [4, 8, 10]  # exact multiples + the final step


def test_run_train_loop_deadline_stops_and_checkpoints(tmp_path, monkeypatch):
    """A wall-clock deadline stops the loop at a chunk boundary, writes a
    checkpoint at the step actually reached, and a resume continues to the
    original target (round-5: framework-level pretrain gating)."""
    import time as _t

    from safediffcon_tpu.utils.checkpoint import latest_step, load_checkpoint

    state, step_fn = _tiny_setup()
    data = np.random.default_rng(0).normal(size=(64, 4)).astype(np.float32)

    # deadline already past: the loop runs zero steps and saves nothing new
    out = run_train_loop(
        step_fn, state, data,
        batch_take=8, num_steps=12, rng=jax.random.PRNGKey(2),
        steps_per_call=4, checkpoint_dir=str(tmp_path),
        log_every=10**9, deadline=_t.time() - 1.0,
    )
    assert int(out.step) == 0
    assert latest_step(str(tmp_path)) is None

    # deadline that expires after the first chunk: exactly one 4-step chunk
    # runs (the gate is checked between chunks), checkpoint lands at 4.
    # run_train_loop reads the clock via the stdlib time module (one t0
    # call, then one gate call per chunk), so patch time.time: calls 1-2
    # (t0 + gate@step0) see t0, later gate calls see past-deadline.
    t0 = _t.time()
    calls = {"n": 0}

    def fake_time():
        # strictly increasing (orbax divides by elapsed time during saves);
        # jumps past the deadline from the 3rd call (= gate at step 4) on
        calls["n"] += 1
        base = 0.0 if calls["n"] <= 2 else 100.0
        return t0 + base + calls["n"] * 1e-3

    monkeypatch.setattr(_t, "time", fake_time)
    out = run_train_loop(
        step_fn, state, data,
        batch_take=8, num_steps=12, rng=jax.random.PRNGKey(2),
        steps_per_call=4, checkpoint_dir=str(tmp_path),
        log_every=10**9, deadline=t0 + 50.0,
    )
    monkeypatch.undo()  # restore the real clock before resume/IO below
    assert int(out.step) == 4
    assert latest_step(str(tmp_path)) == 4

    # resume completes to the target
    restored = load_checkpoint(str(tmp_path), 4, target={
        "step": np.zeros((), np.int32),
        "params": out.params, "opt_state": out.opt_state,
        "ema_params": out.ema_params,
    })
    state2, _ = _tiny_setup()
    state2 = state2.replace(step=jnp.asarray(restored["step"]),
                            params=restored["params"],
                            opt_state=restored["opt_state"],
                            ema_params=restored["ema_params"])
    out2 = run_train_loop(
        step_fn, state2, data,
        batch_take=8, num_steps=12, rng=jax.random.PRNGKey(2),
        start_step=4, steps_per_call=4, checkpoint_dir=str(tmp_path),
        log_every=10**9,
    )
    assert int(out2.step) == 12
    assert latest_step(str(tmp_path)) == 12
