"""2D smoke evaluation: JAX solver rollout of diffused controls + metrics.

Replaces the reference's one-process-per-sample scipy solver pool
(reference: 2d/inference_2d.py:407-507) with the batched JAX rollout; the
metric formulas are ported exactly.
"""
from __future__ import annotations

from typing import Dict, Tuple

import jax.numpy as jnp

from safediffcon_tpu.solvers import smoke as S
from safediffcon_tpu.tasks.smoke.task import CX, CY, DENS, SAFE, SIZE, SMOKE


def solver_rollout(
    masks: S.SmokeMasks,
    pred_scaled: jnp.ndarray,  # (B, F, 64, 64, 7) physical units
    data_scaled: jnp.ndarray,  # (B, F, 64, 64, 7) physical units
    accuracy: float = 1e-8,  # reference eval tolerance (evaluate_solver.py:108)
    max_iter: int = 500,
    time_scale: int = 8,
    space_scale: int = 2,
    backend: str = "xla",
) -> jnp.ndarray:
    """Roll the diffused controls through the solver and reassemble the
    7-channel record (reference: per_evaluate + solver_out assembly,
    2d/inference_2d.py:389-460). Initial density comes from the DATA
    (reference :413: pred[:, 0, 0] = data[:, 0, 0]); control interior is
    zeroed (indirect control, :419: [8:56] at the reference's 64^2)."""
    size = S.N // space_scale
    lo, hi = 16 // space_scale, 112 // space_scale
    ctrl = pred_scaled[..., CX : CY + 1]
    ctrl = ctrl.at[:, :, lo:hi, lo:hi, :].set(0.0)
    init_density = data_scaled[:, 0, :, :, DENS]
    smoke, safe, rec = S.evaluate_control(
        masks, init_density, ctrl[..., 0], ctrl[..., 1],
        accuracy=accuracy, max_iter=max_iter, time_scale=time_scale,
        space_scale=space_scale, backend=backend,
    )
    n_rec = smoke.shape[1]
    out = jnp.zeros(pred_scaled.shape[:1] + (n_rec, size, size, 7), pred_scaled.dtype)
    d = rec.density[:, ::time_scale, ::space_scale, ::space_scale]
    out = out.at[:, :, : d.shape[2], : d.shape[3], DENS].set(d)
    v = rec.velocity[:, ::time_scale, ::space_scale, ::space_scale]
    out = out.at[..., 1].set(v[..., 0])
    out = out.at[..., 2].set(v[..., 1])
    # record the applied (banded) control at record resolution
    c_rec = ctrl[:, :n_rec]
    out = out.at[..., CX : CY + 1].set(c_rec)
    out = out.at[..., SMOKE].set(smoke[:, :, None, None])
    out = out.at[..., SAFE].set(safe[:, :, None, None])
    return out


def evaluate_samples(
    pred_scaled: jnp.ndarray,
    solver_out: jnp.ndarray,
    Q,
    safe_bound: float,
) -> Dict[str, jnp.ndarray]:
    """Metric set ported from multi_evaluate
    (reference: 2d/inference_2d.py:471-507); pred's rate channels must
    already be spatially tiled means (run_model postprocessing)."""
    # first frame masked out of the field-error metrics (reference :474-477)
    mask = jnp.ones(pred_scaled.shape[:2])
    mask = mask.at[:, 0].set(0.0)
    m5 = mask[:, :, None, None, None]
    p = pred_scaled * m5
    d = solver_out * m5

    err = p - d
    mse = jnp.concatenate([err[..., :3], err[..., -2:]], axis=-1)
    mse = (mse**2).mean(axis=(1, 2, 3, 4))
    n_l2 = jnp.sqrt((err[..., :3] ** 2).sum(axis=(1, 2, 3, 4))) / jnp.sqrt(
        (d[..., :3] ** 2).sum(axis=(1, 2, 3, 4))
    )

    m: Dict[str, jnp.ndarray] = {}
    m["J_target"] = (-solver_out[:, -1, 0, 0, SMOKE]).mean()
    m["safe_target"] = solver_out[:, -1, 0, 0, SAFE].mean()

    viol = jnp.maximum(solver_out[:, -1, 0, 0, SAFE] - safe_bound, 0.0)
    m["J_safe_target"] = viol.mean()
    m["unsafe_percentage"] = (viol > 0).mean() * 100.0
    viol_pred = jnp.maximum(pred_scaled[:, -1, 0, 0, SAFE] + Q - safe_bound, 0.0)
    m["J_safe_target_pred"] = viol_pred.mean()
    m["unsafe_percentage_pred"] = (viol_pred > 0).mean() * 100.0

    viol_t = jnp.maximum(solver_out[:, :, 0, 0, SAFE] - safe_bound, 0.0)
    m["unsafe_percentage_time"] = (viol_t > 0).mean() * 100.0
    viol_pt = jnp.maximum(pred_scaled[:, :, 0, 0, SAFE] + Q - safe_bound, 0.0)
    m["unsafe_percentage_pred_time"] = (viol_pt > 0).mean() * 100.0

    m["mse"] = mse.mean()
    m["n_l2"] = n_l2.mean()
    return m
