"""Conditioning: writing known values into diffusion samples each step.

The reference re-imposes conditions (initial state u0, final state uT,
ground-truth control w, zeroed padding) on the sample tensor at every
denoising step and on the noised input during training
(reference: 1D/model/diffusion.py:336-366,469-478,512-521,659-665).

Here a Conditioner is a pytree (flax.struct.dataclass) whose leaves are the
condition arrays; its methods are pure `x -> x` transforms that trace cleanly
inside `lax.scan`. Tasks provide concrete conditioners; core sampling and
training only rely on this protocol:

    apply(x)            -> x with conditions + pad zeroing written in
    loss_target(noise)  -> the regression target with conditioned cells zeroed
    mask_output(out, target) -> model output with padded cells replaced by
                                target (no loss on padding)
"""
from __future__ import annotations

from typing import Protocol

import jax.numpy as jnp


class Conditioner(Protocol):
    def apply(self, x: jnp.ndarray) -> jnp.ndarray:
        """Write all conditions (and pad zeroing) into the sample."""
        ...

    def loss_target(self, noise: jnp.ndarray) -> jnp.ndarray:
        """Zero the conditioned cells of the noise target (teaches the model
        to predict zero noise there)."""
        ...

    def mask_output(self, model_out: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
        """Replace padded cells of the model output with the target so they
        contribute zero loss."""
        ...


class IdentityConditioner:
    """No-op conditioner for unconditional models."""

    def apply(self, x):
        return x

    def loss_target(self, noise):
        return noise

    def mask_output(self, model_out, target):
        return model_out
