"""Guided samplers as fused device-resident loops.

The reference drives its 200-1000 step DDIM / ancestral sampling loops from
Python, one kernel launch per step, re-imposing conditions and re-entering
autograd for guidance every iteration
(reference: 1D/model/diffusion.py:288-555). Here the entire reverse process
is ONE `lax.scan` over timesteps: the guidance gradient is `jax.grad` of the
task safety/objective loss evaluated inside the scan body, so the whole
trajectory of U-Net calls + guidance + conditioning compiles into a single
XLA program with zero host round-trips.

Inference-time fine-tuning (InfFT) semantics: the reference keeps the
autograd graph only through the FINAL denoise step
(1D/model/diffusion.py:524-551). We reproduce that exactly by running the
scan over all-but-the-last step with `stop_gradient`-frozen params and
taking the last step with live params, so `jax.grad` w.r.t. params sees
only the final U-Net call.
"""
from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import numpy as np
import jax
import jax.numpy as jnp

from safediffcon_tpu.core.schedules import DiffusionSchedule
from safediffcon_tpu.core.diffusion import (
    DiffusionConfig,
    predict_start_from_noise,
    predict_noise_from_start,
    predict_start_from_v,
    q_posterior,
)
from safediffcon_tpu.core.conditioning import IdentityConditioner


class ModelPrediction(NamedTuple):
    pred_noise: jnp.ndarray
    pred_x_start: jnp.ndarray


def _batched_t(x, time):
    return jnp.full((x.shape[0],), time, dtype=jnp.int32)


def model_predictions(
    apply_fn: Callable,
    params,
    sched: DiffusionSchedule,
    cfg: DiffusionConfig,
    x: jnp.ndarray,
    time,
    *,
    guidance_grad: Optional[Callable] = None,
    j_scale=1.0,
    clip_x_start: bool = False,
    rederive_pred_noise: bool = False,
    proj_guidance: Optional[Callable] = None,
) -> ModelPrediction:
    """One denoiser evaluation with optional guidance on predicted x0.

    Faithful to reference model_predictions (1D/model/diffusion.py:226-286):
    guidance gradient is evaluated at the (maybe-clipped) x_start derived
    from the raw model output, combined into pred_noise scaled by the
    J-scheduler step size (additively, or via `proj_guidance(ep, nablaJ)` —
    e.g. the ε-orthogonal projections of core/guidance.py, matching the
    reference's proj_guidance kwarg, 1D/model/diffusion.py:328-333), then
    x_start is re-derived (and optionally re-clipped / pred_noise re-derived
    from the clipped x_start).
    """
    t = _batched_t(x, time)
    model_out = apply_fn(params, x, t)

    clip = (lambda v: jnp.clip(v, -1.0, 1.0)) if clip_x_start else (lambda v: v)
    proj = proj_guidance or (lambda ep, nj: ep + nj)

    if cfg.objective == "pred_noise":
        pred_noise = model_out
        x_start = clip(predict_start_from_noise(sched, x, t, pred_noise))
        if guidance_grad is not None:
            g = guidance_grad(jax.lax.stop_gradient(x_start))
            pred_noise = proj(pred_noise, g * j_scale)
        x_start = clip(predict_start_from_noise(sched, x, t, pred_noise))
        if clip_x_start and rederive_pred_noise:
            pred_noise = predict_noise_from_start(sched, x, t, x_start)
    elif cfg.objective == "pred_x0":
        x_start = clip(model_out)
        pred_noise = predict_noise_from_start(sched, x, t, x_start)
    elif cfg.objective == "pred_v":
        x_start = clip(predict_start_from_v(sched, x, t, model_out))
        pred_noise = predict_noise_from_start(sched, x, t, x_start)
    else:
        raise ValueError(f"unknown objective {cfg.objective!r}")

    return ModelPrediction(pred_noise, x_start)


def compose_two_model_apply(
    apply_uw: Callable,
    apply_w: Callable,
    *,
    prior_beta: float = 1.0,
    normalize_beta: bool = False,
    w_scheduler: Optional[Callable] = None,
    mask_w_input: Optional[Callable] = None,
    mask_w_output: Optional[Callable] = None,
) -> Callable:
    """Two-model composed denoiser: p(u,w) corrected by a p(w)-only model.

    Mirrors the reference `eval_two_models` branch
    (1D/model/diffusion.py:226-238): the w-model sees the input with the
    unseen u rows zeroed (`mask_w_input`), its output is restricted to the
    w channel (`mask_w_output`), and the composition is either
    `out - (1 - prior_beta) * eta * out_w` with eta from `w_scheduler(t)`,
    or the normalized `(out - (1 - prior_beta) * out_w) / prior_beta`.

    Returns an `apply_fn(params, x, t)` over params = (params_uw, params_w),
    directly usable with every sampler in this module (the samplers are
    agnostic to what `params` is, so no sampler changes are needed).
    """
    w_scheduler = w_scheduler or (lambda t: 1.0)
    mask_w_input = mask_w_input or (lambda x: x)
    mask_w_output = mask_w_output or (lambda out: out)

    def apply_fn(params, x, t):
        params_uw, params_w = params
        out = apply_uw(params_uw, x, t)
        out_w = mask_w_output(apply_w(params_w, mask_w_input(x), t))
        if normalize_beta:
            return (out - (1.0 - prior_beta) * out_w) / prior_beta
        eta = w_scheduler(t[0])
        return out - (1.0 - prior_beta) * eta * out_w

    return apply_fn


def _ddim_times(cfg: DiffusionConfig):
    """Reversed DDIM time pairs [(T-1, ...), ..., (t1, -1)] as numpy ints.

    Matches torch.linspace(-1, T-1, S+1) int truncation
    (reference: 1D/model/diffusion.py:460-462).
    """
    s = cfg.sampling_timesteps or cfg.timesteps
    times = np.linspace(-1, cfg.timesteps - 1, s + 1)
    times = list(reversed(times.astype(np.int64).tolist()))
    return list(zip(times[:-1], times[1:]))


def ddim_sample(
    apply_fn: Callable,
    params,
    sched: DiffusionSchedule,
    cfg: DiffusionConfig,
    rng: jax.Array,
    shape,
    cond=None,
    guidance_grad: Optional[Callable] = None,
    j_scheduler: Optional[Callable] = None,
    final_step_grad: bool = False,
    init_noise: Optional[jnp.ndarray] = None,
    proj_guidance: Optional[Callable] = None,
) -> jnp.ndarray:
    """Guided DDIM sampling as a single lax.scan.

    Args:
        cond: Conditioner pytree; `cond.apply` is re-applied after every
            update (and once to the initial noise), matching the reference.
        guidance_grad: x_start -> dJ/dx_start (already includes any weights).
        j_scheduler: time -> scalar step size for the guidance gradient.
        final_step_grad: if True, gradients w.r.t. `params` flow only
            through the final denoise step (InfFT semantics).
    """
    cond = cond if cond is not None else IdentityConditioner()
    j_scheduler = j_scheduler or (lambda t: 1.0)
    pairs = _ddim_times(cfg)
    assert pairs[-1][1] < 0, "last DDIM pair must end at t=-1"
    scan_pairs = jnp.asarray(pairs[:-1], dtype=jnp.int32)  # all but final
    final_time = pairs[-1][0]

    img = init_noise if init_noise is not None else jax.random.normal(
        rng, shape, dtype=jnp.float32)
    img = cond.apply(img)

    scan_params = jax.lax.stop_gradient(params) if final_step_grad else params
    eta = cfg.ddim_eta

    def body(carry, pair):
        img, rng = carry
        time, time_next = pair[0], pair[1]
        pred = model_predictions(
            apply_fn,
            scan_params,
            sched,
            cfg,
            img,
            time,
            guidance_grad=guidance_grad,
            j_scale=j_scheduler(time),
            clip_x_start=True,
            rederive_pred_noise=True,
            proj_guidance=proj_guidance,
        )
        alpha = sched.alphas_cumprod[time]
        alpha_next = sched.alphas_cumprod[time_next]
        sigma = eta * jnp.sqrt((1 - alpha / alpha_next) * (1 - alpha_next) / (1 - alpha))
        c = jnp.sqrt(1.0 - alpha_next - sigma**2)
        rng, key = jax.random.split(rng)
        noise = jax.random.normal(key, img.shape, dtype=img.dtype)
        img = pred.pred_x_start * jnp.sqrt(alpha_next) + c * pred.pred_noise + sigma * noise
        img = cond.apply(img)
        return (img, rng), None

    if len(pairs) > 1:
        (img, rng), _ = jax.lax.scan(body, (img, rng), scan_pairs)
    if final_step_grad:
        img = jax.lax.stop_gradient(img)

    # Final step: img = x_start (no condition re-imposition; reference
    # 1D/model/diffusion.py:495-498). This is the only params-differentiable
    # step when final_step_grad is set.
    pred = model_predictions(
        apply_fn,
        params,
        sched,
        cfg,
        img,
        final_time,
        guidance_grad=guidance_grad,
        j_scale=j_scheduler(final_time),
        clip_x_start=True,
        rederive_pred_noise=True,
        proj_guidance=proj_guidance,
    )
    return pred.pred_x_start


def ancestral_sample(
    apply_fn: Callable,
    params,
    sched: DiffusionSchedule,
    cfg: DiffusionConfig,
    rng: jax.Array,
    shape,
    cond=None,
    guidance_grad: Optional[Callable] = None,
    j_scheduler: Optional[Callable] = None,
    final_step_grad: bool = False,
    proj_guidance: Optional[Callable] = None,
    guidance_on_x0: bool = True,
    recurrence: bool = False,
    fix_final_step: bool = True,
) -> jnp.ndarray:
    """Guided ancestral (DDPM) sampling loop as one lax.scan.

    Faithful to p_sample_loop (reference: 1D/model/diffusion.py:368-449):
    conditions are imposed at the TOP of each iteration, x_start is clamped
    when clip_denoised, and noise is omitted at t=0.

    guidance_on_x0=False is the reference's `guidance_u0=False` branch
    (1D/model/diffusion.py:419-424): guidance is evaluated at the denoised
    x_{t-1} instead of pred-x0, combined into pred_noise via proj_guidance,
    and the posterior step is re-taken with the overridden pred_noise (the
    model is NOT re-run — matching the `pred_noise` kwarg override at
    1D/model/diffusion.py:253-256).

    recurrence=True is Universal-Guidance self-recurrence
    (1D/model/diffusion.py:428-430 + recurrent_sample :308-318): after each
    step, x_{t-1} is re-noised back to level t with
    sqrt(alpha_t/alpha_{t-1})·x + sqrt(1 − alpha_t/alpha_{t-1})·z (no noise
    at t=0). The reference's recurrence_k loop is commented out
    (1D/model/diffusion.py:379), so one re-noise per step is the faithful
    behavior.
    """
    cond = cond if cond is not None else IdentityConditioner()
    j_scheduler = j_scheduler or (lambda t: 1.0)
    proj = proj_guidance or (lambda ep, nj: ep + nj)
    T = cfg.timesteps

    img = jax.random.normal(rng, shape, dtype=jnp.float32)
    scan_params = jax.lax.stop_gradient(params) if final_step_grad else params

    def _posterior_step(img, t, time, x_start, rng):
        if cfg.clip_denoised:
            x_start = jnp.clip(x_start, -1.0, 1.0)
        mean, _, log_var = q_posterior(sched, x_start, img, t)
        rng, key = jax.random.split(rng)
        noise = jax.random.normal(key, img.shape, dtype=img.dtype)
        nz = jnp.where(time > 0, 1.0, 0.0)
        return mean + nz * jnp.exp(0.5 * log_var) * noise, rng

    def p_sample(params_, img, time, rng):
        img = cond.apply(img)
        t = _batched_t(img, time)
        pred = model_predictions(
            apply_fn,
            params_,
            sched,
            cfg,
            img,
            time,
            guidance_grad=guidance_grad if guidance_on_x0 else None,
            j_scale=j_scheduler(time),
            clip_x_start=False,
            proj_guidance=proj_guidance,
        )
        img_next, rng = _posterior_step(img, t, time, pred.pred_x_start, rng)
        if guidance_grad is not None and not guidance_on_x0:
            # guidance at x_{t-1}; re-take the posterior step with the
            # overridden pred_noise (fresh noise draw, like the reference's
            # second p_sample call)
            g = guidance_grad(jax.lax.stop_gradient(img_next))
            pred_noise = proj(pred.pred_noise, g * j_scheduler(time))
            x_start = predict_start_from_noise(sched, img, t, pred_noise)
            img_next, rng = _posterior_step(img, t, time, x_start, rng)
        return img_next, rng

    def _recur(img, time, rng):
        # re-noise x_{t-1} back to level t (recurrent_sample)
        a_t = sched.alphas[time]
        a_tm1 = sched.alphas_prev[time]
        rng, key = jax.random.split(rng)
        z = jax.random.normal(key, img.shape, dtype=img.dtype)
        nz = jnp.where(time > 0, 1.0, 0.0)
        return jnp.sqrt(a_t / a_tm1) * img + nz * jnp.sqrt(1 - a_t / a_tm1) * z, rng

    def body(carry, time):
        img, rng = carry
        img, rng = p_sample(scan_params, img, time, rng)
        if recurrence:
            img, rng = _recur(img, time, rng)
        return (img, rng), None

    times = jnp.arange(T - 1, 0, -1, dtype=jnp.int32)  # T-1 ... 1
    (img, rng), _ = jax.lax.scan(body, (img, rng), times)
    if final_step_grad:
        img = jax.lax.stop_gradient(img)
    # Intentional fix of a reference quirk (default fix_final_step=True):
    # with guidance_on_x0=False the reference's t=0 iteration computes the
    # guided update but never writes it back (p_sample_loop leaves `img`
    # untouched on the last step when guidance_u0=False,
    # 1D/model/diffusion.py:404-449), discarding the final denoise. We
    # apply the full guided posterior update at t=0 in both guidance modes
    # — so outputs in this mode differ from the reference at exactly the
    # last step (by design, not a parity bug). Strict output-parity
    # harnesses can opt back into the reference quirk with
    # fix_final_step=False, which skips the t=0 update exactly as the
    # reference does in that mode.
    if fix_final_step or guidance_on_x0 or guidance_grad is None:
        img, _ = p_sample(params, img, 0, rng)
    else:
        # Reference-quirk mode: the t=0 iteration still imposes conditions
        # into img at the top of p_sample (set_condition/set_pad_condition,
        # 1D/model/diffusion.py:435-445) before the guided update is
        # discarded — so byte-for-byte parity requires applying conditions
        # here while skipping the posterior update.
        img = cond.apply(img)
    return img


def sample(
    apply_fn: Callable,
    params,
    sched: DiffusionSchedule,
    cfg: DiffusionConfig,
    rng: jax.Array,
    shape,
    cond=None,
    guidance_grad: Optional[Callable] = None,
    j_scheduler: Optional[Callable] = None,
    final_step_grad: bool = False,
) -> jnp.ndarray:
    """Dispatch DDIM vs ancestral by cfg.sampling_timesteps
    (reference: 1D/model/diffusion.py:557-607)."""
    fn = ddim_sample if cfg.is_ddim else ancestral_sample
    return fn(
        apply_fn,
        params,
        sched,
        cfg,
        rng,
        shape,
        cond=cond,
        guidance_grad=guidance_grad,
        j_scheduler=j_scheduler,
        final_step_grad=final_step_grad,
    )


def dpm_solver_sample(
    apply_fn: Callable,
    params,
    sched: DiffusionSchedule,
    cfg: DiffusionConfig,
    rng: jax.Array,
    shape,
    cond=None,
    guidance_grad: Optional[Callable] = None,
    j_scheduler: Optional[Callable] = None,
    final_step_grad: bool = False,
) -> jnp.ndarray:
    """Guided DPM-Solver++(2M) sampler as a single lax.scan.

    A beyond-parity fast sampler (DPM-Solver++, arXiv 2211.01095): a
    second-order multistep update in data-prediction space that reaches
    DDIM-200 quality in ~20-50 steps. Shares the conditioning/guidance/
    final-step-grad semantics of `ddim_sample`: conditions re-imposed after
    every update, guidance gradient applied inside model_predictions, and
    (for InfFT) parameters differentiable only through the final step.
    """
    cond = cond if cond is not None else IdentityConditioner()
    j_scheduler = j_scheduler or (lambda t: 1.0)
    pairs = _ddim_times(cfg)
    assert pairs[-1][1] < 0, "last pair must end at t=-1"
    scan_pairs = jnp.asarray(pairs[:-1], dtype=jnp.int32)
    final_time = pairs[-1][0]

    acp = sched.alphas_cumprod

    def lam(t):
        a = acp[t]
        return 0.5 * (jnp.log(a) - jnp.log1p(-a))

    def alpha_sigma(t):
        a = acp[t]
        return jnp.sqrt(a), jnp.sqrt(1.0 - a)

    # Initial noise is ALWAYS normal(rng) — the legacy stream. Round 4
    # briefly split rng three ways unconditionally, which silently changed
    # the initial-noise draw for a given seed and broke seed-reproducibility
    # of earlier-round DPM artifacts (ADVICE r4); the noise-matched mode now
    # derives its condition key via fold_in instead, so BOTH modes share the
    # same initial noise and pre-round-4 results reproduce exactly.
    img = jax.random.normal(rng, shape, dtype=jnp.float32)

    # Noise-matched conditioning (cfg.noise_matched_cond, DiffusionConfig):
    # recover the conditioned-cell mask and clean values generically from
    # the Conditioner protocol — apply() writes fixed values (conditions +
    # pad zeros) into a fixed set of cells and leaves the rest untouched,
    # so cells where apply(0) == apply(1) are exactly the written cells.
    if cfg.noise_matched_cond:
        cond_key = jax.random.fold_in(rng, 0x636F6E64)  # b"cond"
        clean = cond.apply(jnp.zeros(shape, jnp.float32))
        cond_mask = clean == cond.apply(jnp.ones(shape, jnp.float32))

        def impose(x, time, key):
            a_t, s_t_ = alpha_sigma(time)
            eps = jax.random.normal(key, shape, dtype=jnp.float32)
            return jnp.where(cond_mask, a_t * clean + s_t_ * eps, x)

        img = impose(img, pairs[0][0], cond_key)
    else:
        img = cond.apply(img)
    scan_params = jax.lax.stop_gradient(params) if final_step_grad else params

    def predict_x0(params_, x, time):
        pred = model_predictions(
            apply_fn, params_, sched, cfg, x, time,
            guidance_grad=guidance_grad, j_scale=j_scheduler(time),
            clip_x_start=True, rederive_pred_noise=True,
        )
        return pred.pred_x_start

    def body(carry, pair):
        img, x0_prev, h_prev, is_first = carry
        t, t_next = pair[0], pair[1]
        x0 = predict_x0(scan_params, img, t)

        lam_t, lam_s = lam(t), lam(t_next)
        h = lam_s - lam_t
        a_s, s_s = alpha_sigma(t_next)
        _, s_t = alpha_sigma(t)

        # 2M correction using the previous x0 (first step falls back to
        # first order, which equals deterministic DDIM)
        r = h_prev / h
        D_2m = (1.0 + 1.0 / (2.0 * r)) * x0 - (1.0 / (2.0 * r)) * x0_prev
        D = jnp.where(is_first, x0, D_2m)

        img = (s_s / s_t) * img - a_s * jnp.expm1(-h) * D
        if cfg.noise_matched_cond:
            img = impose(img, t_next, jax.random.fold_in(cond_key, t_next))
        else:
            img = cond.apply(img)
        return (img, x0, h, jnp.zeros((), jnp.bool_)), None

    carry0 = (img, jnp.zeros_like(img), jnp.ones(()), jnp.ones((), jnp.bool_))
    if len(pairs) > 1:
        (img, _, _, _), _ = jax.lax.scan(body, carry0, scan_pairs)
    if final_step_grad:
        img = jax.lax.stop_gradient(img)
    # final step: x = x0 (matching the DDIM t_next < 0 branch)
    x0 = predict_x0(params, img, final_time)
    if cfg.noise_matched_cond:
        # intermediate imposition was noise-matched; the OUTPUT contract
        # (conditions exact in the returned sample) still holds
        x0 = cond.apply(x0)
    return x0
