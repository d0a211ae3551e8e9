"""Tokamak evaluation: solver rollout of diffused actions + metrics.

Replaces the reference's sequential per-sample Keras rollouts
(reference: tokamak/utils/metrics.py:60-85) with the vmapped JAX surrogate;
the whole evaluate step (sample -> rollout -> metrics) jits into one
program.
"""
from __future__ import annotations

from typing import Dict

import jax.numpy as jnp

from safediffcon_tpu.solvers.kstar import simulate_batch
from safediffcon_tpu.tasks.tokamak.task import BP, LI, NT, N_STATES, Q95


def control_trajectories(params, diffused_scaled: jnp.ndarray) -> jnp.ndarray:
    """Roll the diffused actions through the surrogate.

    diffused_scaled: (B, PAD, 12) physical units. Returns (B, NT, 3)
    controlled states (βp, q95, li)
    (reference: tokamak/utils/metrics.py:60-85)."""
    actions = diffused_scaled[:, : NT - 1, N_STATES:]
    outputs = simulate_batch(params, actions)  # (B, 122, 8)
    return outputs[:, :, jnp.asarray([1, 4, 6])]


def evaluate_samples(
    diffused_scaled: jnp.ndarray,
    state_controlled: jnp.ndarray,
    state_target: jnp.ndarray,
    safety_threshold: float,
) -> Dict[str, jnp.ndarray]:
    """Faithful port of the reference metric set
    (reference: tokamak/utils/metrics.py:11-142)."""
    m: Dict[str, jnp.ndarray] = {}
    diff_states = diffused_scaled[:, :NT, :N_STATES]

    dmse = ((state_controlled - diff_states) ** 2).mean(axis=(-1, -2))
    m["diffusion_mse_mean"] = dmse.mean()
    m["diffusion_mse_std"] = dmse.std(ddof=1)

    bp_mse = ((state_target[:, :, BP] - state_controlled[:, :, BP]) ** 2).mean(-1)
    li_mse = ((state_target[:, :, LI] - state_controlled[:, :, LI]) ** 2).mean(-1)
    m["beta_p_mse_mean"] = bp_mse.mean()
    m["beta_p_mse_std"] = bp_mse.std(ddof=1)
    m["l_i_mse_mean"] = li_mse.mean()
    m["l_i_mse_std"] = li_mse.std(ddof=1)
    m["obj_mse_mean"] = bp_mse.mean() + li_mse.mean()
    m["obj_mse_std"] = (bp_mse + li_mse).std(ddof=1)

    q95 = state_controlled[:, :, Q95]
    below = q95 < safety_threshold
    m["time_below_ratio"] = below.mean()
    m["sample_below_ratio"] = below.any(axis=-1).mean()

    scores = q95.min(axis=-1)
    m["safety_score_mean"] = scores.mean()
    m["safety_score_std"] = scores.std(ddof=1)
    m["diffused_score_mse"] = (
        (diffused_scaled[:, :NT, Q95].min(axis=-1) - scores) ** 2
    ).mean()

    # reported safe metric (reference: tokamak/utils/metrics.py:126-142)
    normalized = safety_threshold / scores
    safe = (scores >= safety_threshold).astype(jnp.float32)
    unsafe = 1.0 - safe
    inside = (normalized * safe).sum() / jnp.maximum(safe.sum(), 1.0)
    outside = (normalized * unsafe).sum() / jnp.maximum(unsafe.sum(), 1.0)
    m["reported_safe_metric"] = inside + outside
    return m
