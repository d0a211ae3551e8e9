import math

import numpy as np
import jax.numpy as jnp

from safediffcon_tpu.solvers.burgers import burgers_solve


def _numpy_reference(u0, f, visc, T, dt, num_t):
    """Independent numpy implementation of the FD scheme: central-diff
    transport on u^2, 3-point diffusion, zero ghost cells, piecewise-constant
    force (the math of reference 1D/data/generate_burgers.py:207-299)."""
    n, s = u0.shape
    dx = 1.0 / (s + 1)
    steps = math.ceil(T / dt)
    record = steps // num_t
    u = u0.copy().astype(np.float64)
    frames = []
    for j in range(steps):
        up = np.pad(u, ((0, 0), (1, 1)))
        us = up**2
        transport = (us[:, 2:] - us[:, :-2]) / (2 * dx)
        diffusion = visc * (up[:, :-2] - 2 * u + up[:, 2:]) / dx**2
        u = u + dt * (-0.5 * transport + diffusion + f[:, j // record, :])
        if (j + 1) % record == 0:
            frames.append(u.copy())
    return np.concatenate([u0[:, None, :], np.stack(frames, 1)], axis=1)


def test_matches_numpy_reference_small():
    rng = np.random.default_rng(0)
    n, s, num_t = 3, 16, 5
    u0 = rng.normal(size=(n, s)).astype(np.float32) * 0.5
    f = rng.normal(size=(n, num_t, s)).astype(np.float32) * 0.2
    T, dt = 0.05, 1e-3  # 50 steps, 10 per record
    ours = np.asarray(burgers_solve(jnp.asarray(u0), jnp.asarray(f), 0.01, T, dt, num_t))
    ref = _numpy_reference(u0, f, 0.01, T, dt, num_t)
    assert ours.shape == (n, num_t + 1, s)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_zero_force_decays():
    """With f=0 and viscosity, energy must decay."""
    rng = np.random.default_rng(1)
    s = 128
    x = np.linspace(1 / (s + 1), 1 - 1 / (s + 1), s)
    u0 = np.sin(2 * np.pi * x)[None, :].astype(np.float32)
    f = np.zeros((1, 10, s), dtype=np.float32)
    traj = np.asarray(burgers_solve(jnp.asarray(u0), jnp.asarray(f)))
    energy = (traj**2).sum(axis=-1)[0]
    assert energy[-1] < energy[0]
    assert np.isfinite(traj).all()


def test_full_resolution_shapes():
    rng = np.random.default_rng(2)
    u0 = rng.normal(size=(4, 128)).astype(np.float32) * 0.1
    f = rng.normal(size=(4, 10, 128)).astype(np.float32) * 0.1
    traj = np.asarray(burgers_solve(jnp.asarray(u0), jnp.asarray(f)))
    assert traj.shape == (4, 11, 128)
    np.testing.assert_allclose(traj[:, 0], u0, atol=1e-7)
