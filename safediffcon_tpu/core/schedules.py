"""Diffusion noise schedules and precomputed buffers.

Pure functions producing a `DiffusionSchedule` pytree of fp32 buffers.
Matches the math of the reference implementation
(reference: 1D/model/model_utils.py:142-158, 1D/model/diffusion.py:104-169)
but computed once in float64 numpy and stored as jnp.float32 arrays, ready
to be closed over by jitted train/sample functions.
"""
from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax.numpy as jnp


class DiffusionSchedule(NamedTuple):
    """All per-timestep buffers needed by training, sampling and guidance."""

    betas: jnp.ndarray
    alphas: jnp.ndarray
    alphas_prev: jnp.ndarray
    alphas_cumprod: jnp.ndarray
    alphas_cumprod_prev: jnp.ndarray
    sqrt_alphas_cumprod: jnp.ndarray
    sqrt_one_minus_alphas_cumprod: jnp.ndarray
    log_one_minus_alphas_cumprod: jnp.ndarray
    sqrt_recip_alphas_cumprod: jnp.ndarray
    sqrt_recipm1_alphas_cumprod: jnp.ndarray
    posterior_variance: jnp.ndarray
    posterior_log_variance_clipped: jnp.ndarray
    posterior_mean_coef1: jnp.ndarray
    posterior_mean_coef2: jnp.ndarray
    loss_weight: jnp.ndarray

    @property
    def num_timesteps(self) -> int:
        return int(self.betas.shape[0])


def linear_beta_schedule(timesteps: int) -> np.ndarray:
    """Linear schedule scaled so that 1000-step behavior is preserved."""
    scale = 1000 / timesteps
    beta_start = scale * 0.0001
    beta_end = scale * 0.02
    return np.linspace(beta_start, beta_end, timesteps, dtype=np.float64)


def cosine_beta_schedule(timesteps: int, s: float = 0.008) -> np.ndarray:
    """Cosine schedule (Nichol & Dhariwal)."""
    steps = timesteps + 1
    x = np.linspace(0, timesteps, steps, dtype=np.float64)
    alphas_cumprod = np.cos(((x / timesteps) + s) / (1 + s) * np.pi * 0.5) ** 2
    alphas_cumprod = alphas_cumprod / alphas_cumprod[0]
    betas = 1 - (alphas_cumprod[1:] / alphas_cumprod[:-1])
    return np.clip(betas, 0, 0.999)


def sigmoid_beta_schedule(
    timesteps: int, start: float = -3, end: float = 3, tau: float = 1
) -> np.ndarray:
    """Sigmoid schedule (arXiv 2212.11972 Fig. 8)."""
    steps = timesteps + 1
    x = np.linspace(0, timesteps, steps, dtype=np.float64) / timesteps
    v_start = 1 / (1 + np.exp(-start / tau))
    v_end = 1 / (1 + np.exp(-end / tau))
    alphas_cumprod = (-1 / (1 + np.exp(-((x * (end - start) + start) / tau))) + v_end) / (
        v_end - v_start
    )
    alphas_cumprod = alphas_cumprod / alphas_cumprod[0]
    betas = 1 - (alphas_cumprod[1:] / alphas_cumprod[:-1])
    return np.clip(betas, 0, 0.999)


_BETA_SCHEDULES = {
    "linear": linear_beta_schedule,
    "cosine": cosine_beta_schedule,
    "sigmoid": sigmoid_beta_schedule,
}


def make_schedule(
    timesteps: int = 1000,
    beta_schedule: str = "cosine",
    objective: str = "pred_noise",
) -> DiffusionSchedule:
    """Build the full buffer set for a diffusion process.

    Loss weights follow the reference SNR convention
    (1D/model/diffusion.py:158-169): ones for pred_noise, snr for pred_x0,
    snr/(snr+1) for pred_v.
    """
    if beta_schedule not in _BETA_SCHEDULES:
        raise ValueError(f"unknown beta schedule {beta_schedule!r}")
    betas = _BETA_SCHEDULES[beta_schedule](timesteps)

    alphas = 1.0 - betas
    alphas_prev = np.concatenate([[1.0], alphas[:-1]])
    alphas_cumprod = np.cumprod(alphas)
    alphas_cumprod_prev = np.concatenate([[1.0], alphas_cumprod[:-1]])

    posterior_variance = betas * (1.0 - alphas_cumprod_prev) / (1.0 - alphas_cumprod)

    snr = alphas_cumprod / (1 - alphas_cumprod)
    if objective == "pred_noise":
        loss_weight = np.ones_like(snr)
    elif objective == "pred_x0":
        loss_weight = snr
    elif objective == "pred_v":
        loss_weight = snr / (snr + 1)
    else:
        raise ValueError(f"unknown objective {objective!r}")

    as_f32 = lambda x: jnp.asarray(x, dtype=jnp.float32)
    return DiffusionSchedule(
        betas=as_f32(betas),
        alphas=as_f32(alphas),
        alphas_prev=as_f32(alphas_prev),
        alphas_cumprod=as_f32(alphas_cumprod),
        alphas_cumprod_prev=as_f32(alphas_cumprod_prev),
        sqrt_alphas_cumprod=as_f32(np.sqrt(alphas_cumprod)),
        sqrt_one_minus_alphas_cumprod=as_f32(np.sqrt(1.0 - alphas_cumprod)),
        log_one_minus_alphas_cumprod=as_f32(np.log(1.0 - alphas_cumprod)),
        sqrt_recip_alphas_cumprod=as_f32(np.sqrt(1.0 / alphas_cumprod)),
        sqrt_recipm1_alphas_cumprod=as_f32(np.sqrt(1.0 / alphas_cumprod - 1)),
        posterior_variance=as_f32(posterior_variance),
        posterior_log_variance_clipped=as_f32(
            np.log(np.clip(posterior_variance, 1e-20, None))
        ),
        posterior_mean_coef1=as_f32(
            betas * np.sqrt(alphas_cumprod_prev) / (1.0 - alphas_cumprod)
        ),
        posterior_mean_coef2=as_f32(
            (1.0 - alphas_cumprod_prev) * np.sqrt(alphas) / (1.0 - alphas_cumprod)
        ),
        loss_weight=as_f32(loss_weight),
    )


def extract(buf: jnp.ndarray, t: jnp.ndarray, ndim: int) -> jnp.ndarray:
    """Gather per-timestep scalars and broadcast to an ndim-tensor shape.

    Equivalent of the reference `extract` (1D/model/model_utils.py:7-10) for a
    batch of timesteps `t` of shape (B,): returns shape (B, 1, ..., 1).
    """
    out = buf[t]
    return out.reshape(out.shape[0], *((1,) * (ndim - 1)))


# Guidance step-size schedulers (reference: 1D/model/model_utils.py:91-180).
# These are functions of the scalar timestep used to scale the guidance
# gradient during sampling; all are closed-form so they trace cleanly.

def cosine_beta_J_schedule(t, s: float = 0.008, timesteps: int = 1000):
    """beta(t) of the cosine schedule, used as an increasing step size."""
    table = jnp.asarray(cosine_beta_schedule(timesteps), dtype=jnp.float32)
    return table[t]


def sigmoid_J_schedule(t, timesteps: int = 1000):
    table = jnp.asarray(sigmoid_beta_schedule(timesteps), dtype=jnp.float32)
    return table[t]


def sigmoid_flip_J_schedule(t, timesteps: int = 1000):
    table = jnp.asarray(sigmoid_beta_schedule(timesteps), dtype=jnp.float32)
    return table[timesteps - 1 - t]


def plain_cosine_J_schedule(t, s: float = 0.0, timesteps: int = 1000):
    """Flipped plain cosine: decreasing in x, indexed flipped so t=0 gets the
    smallest step (reference: 1D/model/model_utils.py:173-180
    plain_cosine_schedule)."""
    x = np.linspace(0, timesteps, timesteps + 1, dtype=np.float64)
    table = jnp.asarray(
        np.cos((x + s) / (timesteps + s))[::-1].copy(), dtype=jnp.float32
    )
    return table[t]


def get_J_scheduler(name):
    """Map scheduler names to callables t -> stepsize (1 if None/'constant')
    (reference: 1D/model/model_utils.py:160-180 get_scheduler; the same
    registry serves both the J and w scheduler kwargs)."""
    if name is None or name == "constant":
        return lambda t: 1.0
    if name == "cosine":
        return cosine_beta_J_schedule
    if name == "plain_cosine":
        return plain_cosine_J_schedule
    if name == "sigmoid":
        return sigmoid_J_schedule
    if name == "sigmoid_flip":
        return sigmoid_flip_J_schedule
    raise ValueError(f"unknown J scheduler {name!r}")


# The reference threads a separate `w_scheduler` name through its sample
# kwargs but resolves it with the same registry (1D/utils/common.py usage of
# get_scheduler); keep that equivalence explicit.
get_w_scheduler = get_J_scheduler
