"""Guidance-combination utilities: how the guidance gradient joins the
predicted noise.

The default combination is additive (ep + nabla_J, reference:
1D/model/diffusion.py:292-294). The reference also offers
epsilon-orthogonal projections of the guidance gradient
(reference: get_proj_ep_orthogonal_func, 1D/model/model_utils.py:71-88,
selectable via proj_guidance in the sample kwargs) — provided here for all
three norms. A proj fn has signature (ep, nabla_J) -> combined_noise.
"""
from __future__ import annotations

import jax.numpy as jnp


def additive(ep: jnp.ndarray, nabla_j: jnp.ndarray) -> jnp.ndarray:
    """Default combination (reference: 1D/model/diffusion.py:292-294)."""
    return ep + nabla_j


def get_proj_ep_orthogonal(norm: str = "F"):
    """Project the guidance gradient onto the complement of epsilon before
    adding, per the reference's three norm conventions
    (1D/model/model_utils.py:71-88)."""
    if norm == "F":

        def proj(ep, nabla_j):
            coef = (nabla_j * ep).sum()
            denom = jnp.sqrt((ep**2).sum(axis=(-2, -1)))[..., None, None]
            return ep + nabla_j - coef * ep / denom

    elif norm == "1D_x":

        def proj(ep, nabla_j):
            coef = (nabla_j * ep).sum(-1, keepdims=True)
            denom = jnp.sqrt((ep**2).sum(-1, keepdims=True))
            return ep + nabla_j - coef * ep / denom

    elif norm == "1D_t":
        # NOTE: the reference's 1D_t branch broadcasts only for unbatched
        # tensors (model_utils.py:84-85 would fail on a batch); we keep the
        # time axis so it is well-formed batched.

        def proj(ep, nabla_j):
            coef = (nabla_j * ep).sum(-2, keepdims=True)
            denom = jnp.sqrt((ep**2).sum(-2, keepdims=True))
            return ep + nabla_j - coef * ep / denom

    else:
        raise NotImplementedError(f"unknown norm {norm!r}")
    return proj
