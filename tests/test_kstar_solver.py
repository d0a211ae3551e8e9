"""KSTAR surrogate round-trip tests against reference-generated goldens.

Golden data (tests/golden/kstar_reference_rollouts.npz) was produced by
running the reference KSTARSolver.simulate (reference:
tokamak/kstar_solver.py:389-428) with its Keras surrogates on three random
action sequences — the same validation style as the reference's own
__main__ round-trip (kstar_solver.py:435-451).
"""
import os

import numpy as np
import jax.numpy as jnp
import pytest

from safediffcon_tpu.solvers import kstar as K

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "kstar_reference_rollouts.npz")


@pytest.fixture(scope="module")
def params():
    return K.load_kstar_params()


@pytest.fixture(scope="module")
def golden():
    return np.load(GOLDEN)


def test_rollout_parity_vs_reference(params, golden):
    for i in range(3):
        out = np.asarray(K.simulate(params, jnp.asarray(golden[f"actions_{i}"])))
        ref = golden[f"outputs_{i}"]
        assert out.shape == (122, 8)
        rel = np.abs(out - ref) / (np.abs(ref) + 1e-6)
        assert rel.max() < 1e-4, f"sample {i}: max rel err {rel.max()}"


def test_batch_matches_single(params, golden):
    actions = jnp.stack(
        [jnp.asarray(golden["actions_0"]), jnp.asarray(golden["actions_1"])]
    )
    batch = np.asarray(K.simulate_batch(params, actions))
    single0 = np.asarray(K.simulate(params, actions[0]))
    # vmap changes fusion order; wmhd ~1e5 magnifies the fp32 wiggle
    np.testing.assert_allclose(batch[0], single0, rtol=1e-5)


def test_action_quantization_and_clip(params):
    # out-of-bounds actions are clipped then truncated to 1e-3
    s0 = K.steady_init(params)
    wild = jnp.asarray(np.full((9,), 99.0, np.float32))
    s1 = K.apply_action(s0, wild)
    np.testing.assert_allclose(
        np.asarray(s1.inputs)[np.asarray(K.ACTION_TO_INPUT)],
        np.trunc(K.HIGH_ACTION * 1000) / 1000,
        atol=1e-6,
    )


def test_closed_loop_shapes(params):
    import jax

    outs, actions, targets = K.closed_loop_batch(params, jax.random.PRNGKey(0), 2)
    assert outs.shape == (2, 122, 8)
    assert actions.shape == (2, 121, 9)
    assert targets.shape == (2, 122, 3)
    # actions respect bounds
    assert (np.asarray(actions) >= K.LOW_ACTION - 1e-6).all()
    assert (np.asarray(actions) <= K.HIGH_ACTION + 1e-6).all()
    # q95 stays in a physical range
    q95 = np.asarray(outs[..., 4])
    assert (q95 > 2.0).all() and (q95 < 9.0).all()
