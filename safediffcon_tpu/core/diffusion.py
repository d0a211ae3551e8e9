"""Gaussian diffusion process: q/p math and the training loss.

Functional port of the reference process math
(reference: 1D/model/diffusion.py:193-224,629-746) over channels-last
trajectory tensors. Everything is a pure function of
(schedule, config, params, arrays, rng) and jit/vmap/pjit-compatible.
"""
from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax
import jax.numpy as jnp

from safediffcon_tpu.core.schedules import DiffusionSchedule, extract
from safediffcon_tpu.core.conditioning import IdentityConditioner


@dataclasses.dataclass(frozen=True)
class DiffusionConfig:
    """Static configuration of the diffusion process (hashable, jit-safe)."""

    timesteps: int = 1000
    sampling_timesteps: Optional[int] = None  # None -> ancestral sampling
    objective: str = "pred_noise"
    beta_schedule: str = "cosine"
    ddim_eta: float = 0.0
    clip_denoised: bool = True
    self_condition: bool = False
    # DPM-Solver++ only: impose conditions at the iterate's own noise level
    # (q_sample of the clean condition values) at intermediate steps instead
    # of writing CLEAN values into a noisy iterate (RePaint-style,
    # arXiv 2201.09865; clean values still written at the final step).
    # MEASURED NEGATIVE (round 4, validation_1d_dpm_cpu_round4.json):
    # J 0.030 -> 0.065 at dpm20 — the U-Nets are TRAINED with clean
    # conditions written into the noised input (core/train.py p_losses,
    # mirroring the reference), so noised conditions are out-of-
    # distribution. Kept (default off) to reproduce the experiment. The
    # measured quality driver at few steps is eta=1 stochasticity:
    # ddim20/50 eta=1 reach J=0.0170/0.0132 vs ddim200's 0.0155, while all
    # deterministic 20-step variants plateau at ~0.030.
    noise_matched_cond: bool = False

    @property
    def is_ddim(self) -> bool:
        return (
            self.sampling_timesteps is not None
            and self.sampling_timesteps < self.timesteps
        )


# ---------------------------------------------------------------------------
# q / p math (pure functions over the schedule)
# ---------------------------------------------------------------------------

def q_sample(sched: DiffusionSchedule, x_start, t, noise):
    """Diffuse x_start to timestep t (reference: 1D/model/diffusion.py:629-636)."""
    nd = x_start.ndim
    return (
        extract(sched.sqrt_alphas_cumprod, t, nd) * x_start
        + extract(sched.sqrt_one_minus_alphas_cumprod, t, nd) * noise
    )


def predict_start_from_noise(sched: DiffusionSchedule, x_t, t, noise):
    nd = x_t.ndim
    return (
        extract(sched.sqrt_recip_alphas_cumprod, t, nd) * x_t
        - extract(sched.sqrt_recipm1_alphas_cumprod, t, nd) * noise
    )


def predict_noise_from_start(sched: DiffusionSchedule, x_t, t, x0):
    nd = x_t.ndim
    return (
        extract(sched.sqrt_recip_alphas_cumprod, t, nd) * x_t - x0
    ) / extract(sched.sqrt_recipm1_alphas_cumprod, t, nd)


def predict_v(sched: DiffusionSchedule, x_start, t, noise):
    nd = x_start.ndim
    return (
        extract(sched.sqrt_alphas_cumprod, t, nd) * noise
        - extract(sched.sqrt_one_minus_alphas_cumprod, t, nd) * x_start
    )


def predict_start_from_v(sched: DiffusionSchedule, x_t, t, v):
    nd = x_t.ndim
    return (
        extract(sched.sqrt_alphas_cumprod, t, nd) * x_t
        - extract(sched.sqrt_one_minus_alphas_cumprod, t, nd) * v
    )


def q_posterior(sched: DiffusionSchedule, x_start, x_t, t):
    """Mean/variance of q(x_{t-1} | x_t, x_0)."""
    nd = x_t.ndim
    mean = (
        extract(sched.posterior_mean_coef1, t, nd) * x_start
        + extract(sched.posterior_mean_coef2, t, nd) * x_t
    )
    var = extract(sched.posterior_variance, t, nd)
    log_var = extract(sched.posterior_log_variance_clipped, t, nd)
    return mean, var, log_var


# ---------------------------------------------------------------------------
# Training loss
# ---------------------------------------------------------------------------

def p_losses(
    apply_fn: Callable,
    params,
    sched: DiffusionSchedule,
    cfg: DiffusionConfig,
    x_start: jnp.ndarray,
    t: jnp.ndarray,
    noise: jnp.ndarray,
    cond=None,
):
    """Per-sample denoising loss, shape (B,).

    Mirrors the reference loss pipeline (1D/model/diffusion.py:638-733):
    noise, condition the noised input, model forward, zero the target at
    conditioned cells, exclude padded cells from loss, MSE reduced per
    sample, SNR loss weight.
    """
    cond = cond if cond is not None else IdentityConditioner()

    x = q_sample(sched, x_start, t, noise)
    x = cond.apply_train(x, x_start) if hasattr(cond, "apply_train") else cond.apply(x)

    model_out = apply_fn(params, x, t)

    if cfg.objective == "pred_noise":
        target = noise
    elif cfg.objective == "pred_x0":
        target = x_start
    elif cfg.objective == "pred_v":
        target = predict_v(sched, x_start, t, noise)
    else:
        raise ValueError(f"unknown objective {cfg.objective!r}")

    # Conditioned cells: target zeroed (model learns to output zero there).
    target = cond.loss_target(target)
    # Padded cells: no loss.
    model_out = cond.mask_output(model_out, target)

    sq = (model_out - target) ** 2
    per_sample = sq.reshape(sq.shape[0], -1).mean(axis=-1)
    return per_sample * sched.loss_weight[t]


def diffusion_loss(
    apply_fn: Callable,
    params,
    sched: DiffusionSchedule,
    cfg: DiffusionConfig,
    rng: jax.Array,
    x_start: jnp.ndarray,
    cond=None,
    weights: Optional[jnp.ndarray] = None,
):
    """Mean training loss with random timesteps and noise.

    `weights` are optional per-sample reweights (conformal post-training,
    reference: 1D/posttrain/post_train.py:206-210).
    """
    rng_t, rng_n = jax.random.split(rng)
    b = x_start.shape[0]
    t = jax.random.randint(rng_t, (b,), 0, cfg.timesteps)
    noise = jax.random.normal(rng_n, x_start.shape, dtype=x_start.dtype)
    per_sample = p_losses(apply_fn, params, sched, cfg, x_start, t, noise, cond)
    if weights is not None:
        per_sample = per_sample * weights
    return per_sample.mean()


class GaussianDiffusion:
    """Convenience bundle of (apply_fn, schedule, config).

    Thin object wrapper over the functional API for code that wants
    model-like ergonomics; all heavy lifting stays in pure functions.
    """

    def __init__(self, apply_fn: Callable, sched: DiffusionSchedule, cfg: DiffusionConfig):
        self.apply_fn = apply_fn
        self.sched = sched
        self.cfg = cfg

    def loss(self, params, rng, x_start, cond=None, weights=None):
        return diffusion_loss(
            self.apply_fn, params, self.sched, self.cfg, rng, x_start, cond, weights
        )

    def per_sample_loss(self, params, rng, x_start, cond=None):
        rng_t, rng_n = jax.random.split(rng)
        b = x_start.shape[0]
        t = jax.random.randint(rng_t, (b,), 0, self.cfg.timesteps)
        noise = jax.random.normal(rng_n, x_start.shape, dtype=x_start.dtype)
        return p_losses(
            self.apply_fn, params, self.sched, self.cfg, x_start, t, noise, cond
        )
