"""Tests for auxiliary components: PINN residual, guidance projection,
k2rz boundary model, smoke dataset stats, CLI parsing."""
import numpy as np
import jax
import jax.numpy as jnp

from safediffcon_tpu.core.guidance import additive, get_proj_ep_orthogonal
from safediffcon_tpu.tasks.burgers.pinn import one_step_solver_u, pinn_loss, residual_gradient
from safediffcon_tpu.solvers.burgers import burgers_solve
from safediffcon_tpu.solvers.kstar import k2rz_forward, load_kstar_params
from safediffcon_tpu.tasks.smoke.stats import (
    dataset_safe_stats,
    dataset_success_rate,
    derive_rescaler,
)


def test_pinn_residual_discriminates():
    """The coarse one-step residual (dt=0.1 explicit Euler — deliberately
    rough, like the reference's 'approximated version') should still score
    a smooth solver trajectory far below same-variance white noise (the
    diffusion term explodes on rough fields)."""
    rng = np.random.default_rng(0)
    x = np.linspace(0, 1, 130)[1:-1]
    u0 = jnp.asarray(
        np.stack([0.3 * np.sin(2 * np.pi * x), 0.3 * np.cos(2 * np.pi * x)]).astype(np.float32)
    )
    f = jnp.zeros((2, 10, 128), jnp.float32)
    u = burgers_solve(u0, f, visc=0.01, T=1.0, dt=1e-4, num_t=10)
    good = float(pinn_loss(u, f))
    noise = jnp.asarray(
        rng.normal(scale=float(np.asarray(u).std()), size=u.shape).astype(np.float32)
    )
    bad = float(pinn_loss(noise, f))
    assert good < bad * 1e-3
    # gradient on the trajectory tensor has the right shape + is finite
    x = jnp.zeros((2, 16, 128, 3)).at[:, :11, :, 0].set(u).at[:, :10, :, 1].set(f)
    g = residual_gradient(x)
    assert g.shape == x.shape and bool(jnp.isfinite(g).all())
    # modes
    for mode in ("forward", "backward"):
        assert np.isfinite(float(pinn_loss(u, f, mode=mode)))


def test_proj_ep_orthogonal():
    rng = np.random.default_rng(0)
    ep = jnp.asarray(rng.normal(size=(2, 16, 128)).astype(np.float32))
    nj = jnp.asarray(rng.normal(size=(2, 16, 128)).astype(np.float32))
    assert np.allclose(np.asarray(additive(ep, nj)), np.asarray(ep + nj))
    for norm in ("F", "1D_x", "1D_t"):
        out = get_proj_ep_orthogonal(norm)(ep, nj)
        assert out.shape == ep.shape
        assert bool(jnp.isfinite(out).all())


def test_k2rz_boundary():
    p = load_kstar_params()
    r, z = k2rz_forward(p, 0.5, 1.8, 1.5, 1.32, 2.22, 1.7, 0.3, 0.75)
    assert r.shape == (65,) and z.shape == (65,)  # closed contour
    assert r[0] == r[-1] and z[0] == z[-1]
    assert 1.0 < r.min() < r.max() < 2.5  # KSTAR vessel scale (meters)


def test_smoke_stats():
    raw = np.zeros((4, 8, 16, 16, 7), np.float32)
    raw[..., 5] = 0.3
    raw[:2, -1, :, :, 6] = 0.5
    assert dataset_success_rate(raw) == np.float32(0.3)
    s = dataset_safe_stats(raw, c_bound=0.1)
    assert s["unsafe_count"] == 2 and abs(s["unsafe_rate"] - 0.5) < 1e-6
    raw[..., 1] = 3.7
    r = derive_rescaler(raw)
    assert r[1] == 4.0 and r[5] == 1.0


def test_cli_parses():
    from safediffcon_tpu.cli import main as climain

    import pytest

    with pytest.raises(SystemExit):
        climain.main(["bogus", "pretrain"])
