"""Pallas pressure-CG kernel tests (interpreter mode on CPU)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from safediffcon_tpu.solvers import smoke as S
from safediffcon_tpu.ops.pressure_cg import pressure_solve_pallas


@pytest.fixture(scope="module")
def masks():
    return S.build_masks()


def test_matches_xla_cg(masks):
    rng = np.random.default_rng(0)
    div = jnp.asarray(rng.normal(size=(2, 127, 127)).astype(np.float32))
    ref = S.pressure_solve(masks, div, 1e-6, 500)
    pal = pressure_solve_pallas(masks, div, 1e-6, 500, interpret=True)
    assert float(jnp.abs(ref - pal).max()) < 1e-3


def test_residual_below_tolerance(masks):
    rng = np.random.default_rng(1)
    div = jnp.asarray(rng.normal(size=(1, 127, 127)).astype(np.float32))
    p = pressure_solve_pallas(masks, div, 1e-6, 500, interpret=True)
    res = S._apply_A(masks, p) - div
    # fp32 recursive-residual termination leaves a small true residual
    assert float(jnp.abs(res).max()) < 1e-3


def test_gradient_adjoint(masks):
    rng = np.random.default_rng(2)
    div = jnp.asarray(rng.normal(size=(1, 127, 127)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(1, 127, 127)).astype(np.float32))

    def loss(d):
        return (pressure_solve_pallas(masks, d, 1e-7, 2000, interpret=True) * w).sum()

    g = jax.grad(loss)(div)
    recovered = S._apply_A(masks, g)
    assert float(jnp.abs(recovered - w).max()) < 1e-3
