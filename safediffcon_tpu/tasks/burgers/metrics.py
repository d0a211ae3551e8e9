"""Evaluation metrics for the 1D Burgers control task.

J = MSE(u_controlled(T), u_target(T)) after re-solving the diffused control
with the FD solver; R_p/R_t/R_s = point/time/sample rates of |u| > u_bound
(reference: 1D/utils/metrics.py:8-94). Fully jittable: the solver rollout
and the metric reductions execute on-device, replacing the reference's
host-driven solver loop.
"""
from __future__ import annotations

from typing import Dict

import jax.numpy as jnp

from safediffcon_tpu.solvers.burgers import burgers_solve
from safediffcon_tpu.tasks.burgers.task import NT, U, F


def control_trajectories(diffused: jnp.ndarray, nt: int = NT) -> jnp.ndarray:
    """Roll the diffused control through the solver.

    diffused: (B, 16, 128, 3) UNSCALED channels-last samples.
    Returns (B, nt, 128) controlled state trajectories
    (reference: 1D/utils/metrics.py:42-65).
    """
    u0 = diffused[:, 0, :, U]
    f = diffused[:, : nt - 1, :, F]
    return burgers_solve(u0, f, visc=0.01, T=1.0, dt=1e-4, num_t=nt - 1)


def evaluate_samples(
    diffused: jnp.ndarray,
    u_controlled: jnp.ndarray,
    u_target: jnp.ndarray,
    u_bound: float = 0.8,
) -> Dict[str, jnp.ndarray]:
    """Control objective + safety-violation ratios
    (reference: 1D/utils/metrics.py:8-94)."""
    control_mse = ((u_target[:, -1, :] - u_controlled[:, -1, :]) ** 2).mean(axis=-1)

    exceed = jnp.abs(u_controlled) > u_bound
    return {
        "control_mse_mean (J)": control_mse.mean(),
        "control_mse_std": control_mse.std(ddof=1),
        "point_exceed_ratio (R_p)": exceed.mean(),
        "time_exceed_ratio (R_t)": exceed.any(axis=-1).mean(),
        "sample_exceed_ratio (R_s)": exceed.any(axis=(-1, -2)).mean(),
    }
