"""Finite-difference Burgers' equation solver in JAX.

Ground-truth solver for the 1D control task, numerically equivalent to the
reference explicit-Euler scheme (reference: 1D/data/generate_burgers.py:207-299):
for each interior grid point i with zero ghost cells at the domain ends,

    du/dt = -1/2 * d(u^2)/dx + visc * d2u/dx2 + f(t, x)
    d(u^2)/dx  ~ (u^2[i+1] - u^2[i-1]) / (2 dx)      (central, 2nd order)
    d2u/dx2    ~ (u[i-1] - 2 u[i] + u[i+1]) / dx^2

with dx = 1/(s+1), dt explicit Euler, and the control force f held constant
over each of `num_t` equal chunks of the `T/dt` steps.

TPU re-design: the reference drives 10,000 tiny host-side steps through
einsum-gathered scipy stencil rows; here the stencil is expressed as shifted
slices and the whole rollout is a `lax.scan` over `num_t` chunks x an
unrolled `fori_loop` inside, fully batched over samples, so the entire
trajectory executes on-device in one XLA program (jit/vmap/pjit friendly).
"""
from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("visc", "T", "dt", "num_t", "inner_unroll"))
def burgers_solve(
    u0: jnp.ndarray,
    f: jnp.ndarray,
    visc: float = 0.01,
    T: float = 1.0,
    dt: float = 1e-4,
    num_t: int = 10,
    inner_unroll: int = 10,
) -> jnp.ndarray:
    """Batched Burgers rollout.

    Args:
        u0: (N, s) initial states.
        f: (N, num_t, s) piecewise-constant control forces.
        visc, T, dt, num_t: as in the reference solver.

    Returns:
        (N, num_t + 1, s) trajectories, u0 prepended
        (reference: burgers_numeric_solve_free, 1D/data/generate_burgers.py:297-299).
    """
    n, s = u0.shape
    assert f.shape == (n, num_t, s), f"force shape {f.shape} != {(n, num_t, s)}"
    dx = 1.0 / (s + 1)
    steps = math.ceil(T / dt)
    record_every = steps // num_t
    assert record_every * num_t == steps, "T/dt must divide evenly into num_t chunks"

    inv_2dx = 0.5 / dx
    visc_inv_dx2 = visc / dx**2

    def euler_step(u, fj):
        up = jnp.pad(u, ((0, 0), (1, 1)))
        us = up * up
        transport = (us[:, 2:] - us[:, :-2]) * inv_2dx
        diffusion = (up[:, :-2] - 2.0 * u + up[:, 2:]) * visc_inv_dx2
        return u + dt * (-0.5 * transport + diffusion + fj)

    def chunk(u, fj):
        u = jax.lax.fori_loop(
            0, record_every, lambda _, uu: euler_step(uu, fj), u, unroll=inner_unroll
        )
        return u, u

    _, frames = jax.lax.scan(chunk, u0, jnp.swapaxes(f, 0, 1))
    return jnp.concatenate([u0[:, None, :], jnp.swapaxes(frames, 0, 1)], axis=1)
