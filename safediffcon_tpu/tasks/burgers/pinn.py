"""Coarse one-step PINN residual for the Burgers task.

Port of the reference's optional physics-consistency loss
(reference: 1D/model/pinn_loss.py:46-134, enabled by the
`use_grad_norm/residual` train options, off by default in
1D/configs/train_config.py:39): a Crank-Nicolson-style one-step consistency
check of the (u, f) channels of a trajectory tensor at the coarse 11-step
resolution, used either as an extra loss term or as a guidance gradient.

Stencils are central differences with Dirichlet boundaries via zero ghost
cells, matching the reference's scipy-LIL-derived rows.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from safediffcon_tpu.tasks.burgers.task import NT, U, F


def one_step_solver_u(
    u: jnp.ndarray,
    f: jnp.ndarray,
    dt: float = 0.1,
    visc: float = 0.01,
    mode: str = "mean",
) -> jnp.ndarray:
    """Predict each frame of u from its neighbors with one coarse FD step
    (reference: 1D/model/pinn_loss.py:46-98).

    u: (B, 11, s); f: (B, 10, s). Returns u_pde (B, 11, s).
    """
    s = u.shape[-1]
    dx = 1.0 / (s + 1)

    def rhs(uu, ff):
        up = jnp.pad(uu, ((0, 0), (0, 0), (1, 1)))
        du = (up[..., 2:] - up[..., :-2]) / (2 * dx)
        d2u = (up[..., :-2] - 2 * uu + up[..., 2:]) / dx**2
        return -uu * du + visc * d2u + ff

    u_next = u[:, :-1] + dt * rhs(u[:, :-1], f)  # forward prediction of u[1:]
    u_prev = u[:, 1:] - dt * rhs(u[:, 1:], f)  # backward prediction of u[:-1]

    if mode == "mean":
        u_pde = jnp.zeros_like(u)
        u_pde = u_pde.at[:, 1:].set(u_next / 2)
        u_pde = u_pde.at[:, :-1].add(u_prev / 2)
    elif mode == "forward":
        u_pde = jnp.concatenate([u[:, :1], u_next], axis=1)
    elif mode == "backward":
        u_pde = jnp.concatenate([u_prev, u[:, -1:]], axis=1)
    else:
        raise ValueError(f"unknown mode {mode!r}")
    return u_pde


def pinn_loss(
    u: jnp.ndarray, f: jnp.ndarray, mode: str = "mean",
    partially_observed: Optional[str] = None,
) -> jnp.ndarray:
    """MSE between u and its one-step FD reconstruction
    (reference: 1D/model/pinn_loss.py:100-115)."""
    u_pde = one_step_solver_u(u, f, mode=mode)
    if partially_observed:
        nx = u.shape[-1]
        u_pde = u_pde.at[..., nx // 4 : (nx * 3) // 4].set(
            u[..., nx // 4 : (nx * 3) // 4]
        )
    return ((u_pde - u) ** 2).mean()


def residual_gradient(x: jnp.ndarray, mode: str = "mean") -> jnp.ndarray:
    """d(pinn loss)/dx over the full trajectory tensor (B, 16, 128, 3),
    usable as an extra guidance term
    (reference: 1D/model/pinn_loss.py:129-134)."""

    def loss(xx):
        u = xx[:, :NT, :, U]
        f = xx[:, : NT - 1, :, F]
        return pinn_loss(u, f, mode=mode)

    return jax.grad(loss)(x)
