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


def test_checkpoint_sweep_eval(tmp_path, capsys):
    """--checkpoints sweep driver: range parsing, per-checkpoint failure
    tolerance, results table (reference: 1D/run_eval.py + 1D/eval.py:129-153)."""
    import argparse
    import json as _json
    from safediffcon_tpu.cli.main import _eval_sweep, _parse_checkpoints

    assert _parse_checkpoints("10:200:10") == list(range(10, 201, 10))
    assert _parse_checkpoints("3:5") == [3, 4, 5]
    assert _parse_checkpoints("10,20,170") == [10, 20, 170]

    calls = []

    def eval_one(step):
        calls.append(step)
        if step == 2:
            raise RuntimeError("broken milestone")
        return {"J": 0.1 * step, "quantile": 1.0}

    args = argparse.Namespace(checkpoints="1:3", out=str(tmp_path))
    _eval_sweep(args, "burgers", eval_one)
    assert calls == [1, 2, 3]
    with open(tmp_path / "burgers_eval_sweep.json") as f:
        table = _json.load(f)
    assert table["1"]["J"] == 0.1 and "error" in table["2"]
    out = capsys.readouterr().out
    assert "checkpoint" in out and "J" in out

    # single-checkpoint path unchanged
    args1 = argparse.Namespace(checkpoints=None, out=str(tmp_path))
    _eval_sweep(args1, "burgers", lambda s: {"J": 0.5})
    with open(tmp_path / "burgers_eval_results.json") as f:
        assert _json.load(f)["J"] == 0.5
