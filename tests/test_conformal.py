import math

import numpy as np
import jax.numpy as jnp

from safediffcon_tpu.core.conformal import (
    conformal_quantile,
    normalize_weights,
    quantile_rank,
    weighted_quantile,
)


def _numpy_quantile_1d(scores, alpha):
    """Reference rank convention (1D/posttrain/conformal.py:90-113)."""
    n = len(scores)
    rank = min(int(np.ceil(alpha * (n + 1))), n) - 1
    return np.sort(scores)[rank]


def test_normalize_weights_basic():
    w = jnp.array([1.0, 2.0, 3.0, 4.0])
    out = np.asarray(normalize_weights(w))
    assert np.isclose(out.sum(), 4.0)
    np.testing.assert_allclose(out, np.array([1, 2, 3, 4]) * 4 / 10)


def test_normalize_weights_inf_replaced():
    w = jnp.array([1.0, jnp.inf, 3.0])
    out = np.asarray(normalize_weights(w))
    expected = np.array([1.0, 3.0, 3.0])
    np.testing.assert_allclose(out, 3 * expected / expected.sum())


def test_normalize_weights_all_zero():
    out = np.asarray(normalize_weights(jnp.zeros(5)))
    np.testing.assert_allclose(out, np.ones(5))


def test_quantile_matches_numpy():
    rng = np.random.default_rng(0)
    scores = rng.uniform(size=1000).astype(np.float32)
    for alpha in (0.5, 0.9, 0.98):
        ours = float(weighted_quantile(jnp.asarray(scores), alpha))
        assert np.isclose(ours, _numpy_quantile_1d(scores, alpha))


def test_quantile_rank_conventions():
    # 1D convention: alpha=0.98, n=1000 -> ceil(0.98*1001)-1 = 981-1 = 980
    assert quantile_rank(1000, 0.98, "alpha") == math.ceil(0.98 * 1001) - 1
    # worst-case clamp
    assert quantile_rank(10, 0.999, "alpha") == 9
    # 2D convention: alpha=0.04, n=200 -> ceil(201*0.96)-1 = 193-1=192
    assert quantile_rank(200, 0.04, "one_minus_alpha") == math.ceil(201 * 0.96) - 1
    assert quantile_rank(10, 0.999, "one_minus_alpha") == 0


def test_conformal_quantile_end_to_end():
    rng = np.random.default_rng(1)
    scores = rng.uniform(size=100).astype(np.float32)
    weights = rng.uniform(0.5, 2.0, size=100).astype(np.float32)
    q = float(conformal_quantile(jnp.asarray(scores), jnp.asarray(weights), 0.9))
    w = weights.copy()
    w = 100 * w / w.sum()
    expected = _numpy_quantile_1d(w * scores, 0.9)
    assert np.isclose(q, expected, rtol=1e-6)
