import numpy as np
import jax
import jax.numpy as jnp

from safediffcon_tpu.core.diffusion import DiffusionConfig
from safediffcon_tpu.core.sampling import ddim_sample, ancestral_sample, _ddim_times
from safediffcon_tpu.core.schedules import make_schedule
from safediffcon_tpu.tasks.burgers.task import BurgersConditioner, COND_IDX


def _zero_model(params, x, t):
    return jnp.zeros_like(x)


def test_ddim_time_pairs():
    cfg = DiffusionConfig(timesteps=1000, sampling_timesteps=200)
    pairs = _ddim_times(cfg)
    assert len(pairs) == 200
    assert pairs[0][0] == 999
    assert pairs[-1][1] == -1
    # strictly decreasing
    times = [p[0] for p in pairs]
    assert all(a > b for a, b in zip(times, times[1:]))


def test_ddim_zero_model_returns_clipped_x0():
    """With eps_hat = 0, x_start = x / sqrt(acp) clipped; final output must be
    the clipped x_start of the last step."""
    sched = make_schedule(100)
    cfg = DiffusionConfig(timesteps=100, sampling_timesteps=5, ddim_eta=0.0)
    rng = jax.random.PRNGKey(0)
    out = ddim_sample(_zero_model, None, sched, cfg, rng, (2, 16, 8, 3))
    assert out.shape == (2, 16, 8, 3)
    assert np.all(np.abs(np.asarray(out)) <= 1.0 + 1e-6)


def test_ddim_conditioning_preserved_through_loop():
    """Conditions re-imposed each step must survive to the penultimate state;
    the final x_start obeys the model, but with a model that echoes zero
    noise the conditioned cells of the final prediction derive from the
    conditioned state."""
    sched = make_schedule(100)
    cfg = DiffusionConfig(timesteps=100, sampling_timesteps=8, ddim_eta=0.0)
    b, nx = 2, 8
    u0 = jnp.full((b, nx), 0.45)
    cond = BurgersConditioner(u0=u0)
    out = ddim_sample(
        _zero_model, None, sched, cfg, jax.random.PRNGKey(1), (b, 16, nx, 3), cond=cond
    )
    # zero-noise model: x_start(last) = clip(img / sqrt(acp_t1)); conditioned
    # row was set to 0.45 before the last step, acp at t1 ~ 1 for small t
    t1 = _ddim_times(cfg)[-1][0]
    acp = float(sched.alphas_cumprod[t1])
    expected = np.clip(0.45 / np.sqrt(acp), -1, 1)
    np.testing.assert_allclose(np.asarray(out[:, 0, :, 0]), expected, rtol=1e-4)


def test_ancestral_runs_and_is_finite():
    sched = make_schedule(20)
    cfg = DiffusionConfig(timesteps=20, sampling_timesteps=None)
    out = ancestral_sample(
        _zero_model, None, sched, cfg, jax.random.PRNGKey(2), (1, 16, 8, 3)
    )
    assert out.shape == (1, 16, 8, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_guidance_shifts_samples():
    """A constant guidance gradient must shift the output vs no guidance."""
    sched = make_schedule(50)
    cfg = DiffusionConfig(timesteps=50, sampling_timesteps=5, ddim_eta=0.0)
    rng = jax.random.PRNGKey(3)
    base = ddim_sample(_zero_model, None, sched, cfg, rng, (1, 16, 8, 3))
    guided = ddim_sample(
        _zero_model, None, sched, cfg, rng, (1, 16, 8, 3),
        guidance_grad=lambda x: jnp.ones_like(x) * 0.5,
    )
    assert not np.allclose(np.asarray(base), np.asarray(guided))


def test_infft_grad_only_through_final_step():
    """final_step_grad: the gradient w.r.t. params must equal the gradient of
    the final model call only (scan steps frozen)."""
    sched = make_schedule(50)
    cfg = DiffusionConfig(timesteps=50, sampling_timesteps=4, ddim_eta=0.0)

    def apply_fn(params, x, t):
        return params["w"] * x

    params = {"w": jnp.asarray(0.1)}

    def loss(params, frozen_scan):
        out = ddim_sample(
            apply_fn, params, sched, cfg, jax.random.PRNGKey(0), (1, 16, 8, 3),
            final_step_grad=frozen_scan,
        )
        return (out**2).mean()

    g = jax.grad(loss)(params, True)
    assert np.isfinite(float(g["w"]))
    # gradient must be nonzero (final step uses params)
    assert abs(float(g["w"])) > 0
    # and differ from the full-chain gradient (scan steps contribute there)
    g_full = jax.grad(loss)(params, False)
    assert not np.isclose(float(g["w"]), float(g_full["w"]))


def test_dpm_solver_sampler():
    """DPM-Solver++(2M): shapes/conditioning invariants + InfFT grad path."""
    from safediffcon_tpu.core.sampling import dpm_solver_sample
    from safediffcon_tpu.models.unet2d import UNet2D

    model = UNet2D(dim=8, dim_mults=(1, 2), channels=3, resnet_block_groups=1)
    apply_fn = lambda p, x, t: model.apply(p, x, t)
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 16, 32, 3)), jnp.zeros((1,), jnp.int32)
    )
    sched = make_schedule(50)
    cfg = DiffusionConfig(timesteps=50, sampling_timesteps=6, ddim_eta=0.0)
    shape = (2, 16, 32, 3)
    u0 = jnp.ones((2, 32)) * 0.3
    cond = BurgersConditioner(u0=u0)
    out = dpm_solver_sample(
        apply_fn, params, sched, cfg, jax.random.PRNGKey(0), shape, cond=cond
    )
    assert out.shape == shape
    assert bool(jnp.isfinite(out).all())

    # final-step-grad: params grad flows and is finite
    def loss(p):
        o = dpm_solver_sample(
            apply_fn, p, sched, cfg, jax.random.PRNGKey(0), shape, cond=cond,
            final_step_grad=True,
        )
        return (o**2).mean()

    g = jax.grad(loss)(params)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(bool(jnp.isfinite(l).all()) for l in leaves)
    assert any(float(jnp.abs(l).max()) > 0 for l in leaves)


def test_two_model_composition():
    """compose_two_model_apply matches the reference eval_two_models math
    (1D/model/diffusion.py:226-238) on toy linear denoisers."""
    from safediffcon_tpu.core.sampling import compose_two_model_apply

    apply_uw = lambda p, x, t: p * x
    apply_w = lambda p, x, t: p + x
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 4, 4, 3)),
                    dtype=jnp.float32)
    t = jnp.full((2,), 7, dtype=jnp.int32)
    params = (jnp.float32(2.0), jnp.float32(0.5))
    mask_in = lambda v: v.at[:, 1:3].set(0.0)
    mask_out = lambda v: v.at[..., 0].set(0.0)
    w_sched = lambda time: 0.25 * time

    fn = compose_two_model_apply(
        apply_uw, apply_w, prior_beta=0.8, w_scheduler=w_sched,
        mask_w_input=mask_in, mask_w_output=mask_out,
    )
    out = fn(params, x, t)
    out_w = np.asarray(mask_out(0.5 + mask_in(x)))
    expect = 2.0 * np.asarray(x) - (1 - 0.8) * (0.25 * 7) * out_w
    np.testing.assert_allclose(np.asarray(out), expect, rtol=1e-6)

    fn_norm = compose_two_model_apply(
        apply_uw, apply_w, prior_beta=0.8, normalize_beta=True,
        mask_w_input=mask_in, mask_w_output=mask_out,
    )
    out2 = fn_norm(params, x, t)
    expect2 = (2.0 * np.asarray(x) - (1 - 0.8) * out_w) / 0.8
    np.testing.assert_allclose(np.asarray(out2), expect2, rtol=1e-6)

    # composed apply_fn runs through the standard sampler unchanged
    sched = make_schedule(10, "cosine")
    cfg = DiffusionConfig(timesteps=10, sampling_timesteps=4)
    zero_pair = (lambda p, x, t: jnp.zeros_like(x), lambda p, x, t: jnp.zeros_like(x))
    fn0 = compose_two_model_apply(*zero_pair, prior_beta=0.9)
    out3 = ddim_sample(fn0, (None, None), sched, cfg, jax.random.PRNGKey(0),
                       (2, 4, 4, 3))
    assert np.isfinite(np.asarray(out3)).all()


def test_recurrence_changes_trajectory_and_stays_finite():
    """Universal-Guidance self-recurrence (reference: 1D/model/diffusion.py:
    428-430, recurrent_sample :308-318): re-noising each step changes the
    sample path but keeps it finite and clipped at the end."""
    sched = make_schedule(30)
    cfg = DiffusionConfig(timesteps=30)
    rng = jax.random.PRNGKey(7)
    base = ancestral_sample(_zero_model, None, sched, cfg, rng, (2, 16, 8, 3))
    rec = ancestral_sample(_zero_model, None, sched, cfg, rng, (2, 16, 8, 3),
                           recurrence=True)
    assert np.isfinite(np.asarray(rec)).all()
    assert not np.allclose(np.asarray(base), np.asarray(rec))


def test_guidance_on_xprev_branch():
    """guidance_u0=False branch (reference: 1D/model/diffusion.py:419-424):
    guidance at x_{t-1} shifts the output, and differs from the x0 branch."""
    sched = make_schedule(30)
    cfg = DiffusionConfig(timesteps=30)
    rng = jax.random.PRNGKey(8)
    g = lambda x: jnp.ones_like(x) * 0.3
    base = ancestral_sample(_zero_model, None, sched, cfg, rng, (1, 16, 8, 3))
    on_x0 = ancestral_sample(_zero_model, None, sched, cfg, rng, (1, 16, 8, 3),
                             guidance_grad=g)
    on_xprev = ancestral_sample(_zero_model, None, sched, cfg, rng,
                                (1, 16, 8, 3), guidance_grad=g,
                                guidance_on_x0=False)
    assert np.isfinite(np.asarray(on_xprev)).all()
    assert not np.allclose(np.asarray(base), np.asarray(on_xprev))
    assert not np.allclose(np.asarray(on_x0), np.asarray(on_xprev))


def test_proj_guidance_matches_reference_formula():
    """proj_guidance hook with the F-norm projection reproduces the
    reference's exact (quirky) formula: a GLOBAL (nabla_J·ep) sum and a
    per-sample sqrt-of-F-norm denominator — NOT a textbook orthogonal
    projection (reference: get_proj_ep_orthogonal_func,
    1D/model/model_utils.py:76-78)."""
    from safediffcon_tpu.core.guidance import get_proj_ep_orthogonal

    proj = get_proj_ep_orthogonal("F")
    rng = np.random.default_rng(0)
    ep = rng.normal(size=(2, 16, 8, 3)).astype(np.float32)
    nj = rng.normal(size=(2, 16, 8, 3)).astype(np.float32)
    got = np.asarray(proj(jnp.asarray(ep), jnp.asarray(nj)))
    coef = (nj * ep).sum()
    denom = np.sqrt((ep**2).sum(axis=(-2, -1)))[..., None, None]
    expect = ep + nj - coef * ep / denom
    np.testing.assert_allclose(got, expect, rtol=1e-4, atol=1e-6)


def test_ddim_proj_guidance_runs():
    from safediffcon_tpu.core.guidance import get_proj_ep_orthogonal

    def noisy_model(params, x, t):
        return jnp.ones_like(x) * 0.2  # nonzero ep keeps the proj denominator sane

    sched = make_schedule(30)
    cfg = DiffusionConfig(timesteps=30, sampling_timesteps=4, ddim_eta=0.0)
    out = ddim_sample(
        noisy_model, None, sched, cfg, jax.random.PRNGKey(10), (1, 16, 8, 3),
        guidance_grad=lambda x: x * 0.1,
        proj_guidance=get_proj_ep_orthogonal("F"),
    )
    assert np.isfinite(np.asarray(out)).all()


def test_dpm_noise_matched_cond():
    """noise_matched_cond (measured-negative option, kept reproducible):
    identity-conditioner sampling is bit-identical to the default path; a
    real conditioner still returns exact clean conditions in the output."""
    from safediffcon_tpu.core.sampling import dpm_solver_sample
    from safediffcon_tpu.models.unet2d import UNet2D

    model = UNet2D(dim=8, dim_mults=(1, 2), channels=3, resnet_block_groups=1)
    apply_fn = lambda p, x, t: model.apply(p, x, t)
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 16, 32, 3)), jnp.zeros((1,), jnp.int32)
    )
    sched = make_schedule(50)
    shape = (2, 16, 32, 3)
    base = DiffusionConfig(timesteps=50, sampling_timesteps=6)
    nm = DiffusionConfig(timesteps=50, sampling_timesteps=6,
                         noise_matched_cond=True)
    a = dpm_solver_sample(apply_fn, params, sched, base,
                          jax.random.PRNGKey(0), shape)
    b = dpm_solver_sample(apply_fn, params, sched, nm,
                          jax.random.PRNGKey(0), shape)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=0)

    u0 = jnp.ones((2, 32)) * 0.3
    out = dpm_solver_sample(apply_fn, params, sched, nm,
                            jax.random.PRNGKey(1), shape,
                            cond=BurgersConditioner(u0=u0))
    assert bool(jnp.isfinite(out).all())
    np.testing.assert_allclose(np.asarray(out[:, 0, :, 0]), np.asarray(u0))


def test_parity_mode_final_step_still_applies_conditions():
    """ADVICE r4 (medium): fix_final_step=False + guidance_on_x0=False must
    still impose conditions at t=0 — the reference writes set_condition /
    set_pad_condition into img before discarding the guided update
    (1D/model/diffusion.py:435-445) — while skipping the posterior update."""
    sched = make_schedule(30)
    cfg = DiffusionConfig(timesteps=30)
    u0 = jnp.full((1, 8), 0.37)
    cond = BurgersConditioner(u0=u0)
    out = ancestral_sample(
        _zero_model, None, sched, cfg, jax.random.PRNGKey(9), (1, 16, 8, 3),
        cond=cond, guidance_grad=lambda x: jnp.ones_like(x) * 0.3,
        guidance_on_x0=False, fix_final_step=False)
    # conditioned cells are exactly clean in the returned sample
    np.testing.assert_allclose(np.asarray(out[:, 0, :, 0]), 0.37, atol=0)
    # idempotence: re-applying the conditioner changes nothing
    np.testing.assert_allclose(np.asarray(cond.apply(out)), np.asarray(out),
                               atol=0)
