"""Weighted conformal prediction: scores, shift-weights, quantile Q-hat.

Batched jittable math replacing the reference's Python-side batch loops
(reference: 1D/posttrain/conformal.py:25-113, 1D/inference/conformal.py:25-118,
tokamak/inference/conformal.py, 2d/inference_2d.py:113-171).

The pipeline is:
  1. sample the model on the calibration set conditioned on ground-truth
     controls (task pipelines do this with the fused sampler),
  2. nonconformity score per sample = |safety statistic(sample) - (truth)|,
  3. distribution-shift weight per sample = exp(-guidance(x, Q)),
  4. normalize weights to mean 1, multiply into scores,
  5. Q-hat = rank statistic of the weighted scores.

Two rank conventions exist in the reference and both are provided:
  - "alpha":      rank = min(ceil(alpha * (n+1)), n) - 1       (1D, tokamak)
  - "one_minus_alpha": rank = ceil((n+1) * (1-alpha)) - 1, clamped
                                                                (2D smoke)
"""
from __future__ import annotations

import math

import jax.numpy as jnp


def normalize_weights(weights: jnp.ndarray) -> jnp.ndarray:
    """Replace infs with the max finite weight, then scale to sum = n.

    Faithful to the reference (1D/posttrain/guidance.py:48-66), including the
    all-zero fallback to uniform weights.
    """
    finite = jnp.isfinite(weights)
    max_finite = jnp.max(jnp.where(finite, weights, -jnp.inf))
    w = jnp.where(jnp.isinf(weights), max_finite, weights)
    total = w.sum()
    n = w.shape[0]
    uniform = jnp.ones_like(w)
    return jnp.where(total == 0, uniform, n * w / jnp.where(total == 0, 1.0, total))


def quantile_rank(n: int, alpha: float, convention: str = "alpha") -> int:
    """Static rank index into the sorted weighted scores."""
    if convention == "alpha":
        # reference: 1D/posttrain/conformal.py:107
        return min(int(math.ceil(alpha * (n + 1))), n) - 1
    if convention == "one_minus_alpha":
        # reference: 2d/inference_2d.py:150-165 —
        # q = int(min(ceil((n+1)(1-alpha)), n-1)); rank = q - 1
        return max(min(int(math.ceil((n + 1) * (1.0 - alpha))), n - 1) - 1, 0)
    raise ValueError(f"unknown quantile convention {convention!r}")


def weighted_quantile(
    scores: jnp.ndarray, alpha: float, convention: str = "alpha"
) -> jnp.ndarray:
    """Q-hat = sorted(scores)[rank]; scores are already weight-multiplied."""
    rank = quantile_rank(int(scores.shape[0]), alpha, convention)
    return jnp.sort(scores)[rank]


def conformal_quantile(
    scores: jnp.ndarray,
    weights: jnp.ndarray,
    alpha: float,
    convention: str = "alpha",
) -> jnp.ndarray:
    """Full step 4-5: normalize weights, weight the scores, take the rank
    statistic. Returns a scalar Q-hat."""
    w = normalize_weights(weights)
    return weighted_quantile(w * scores, alpha, convention)
