import numpy as np
import jax.numpy as jnp

from safediffcon_tpu.core.schedules import (
    DiffusionSchedule,
    cosine_beta_schedule,
    linear_beta_schedule,
    make_schedule,
    extract,
    get_J_scheduler,
)


def test_cosine_schedule_closed_form():
    T = 1000
    betas = cosine_beta_schedule(T)
    s = 0.008
    x = np.linspace(0, T, T + 1)
    ac = np.cos(((x / T) + s) / (1 + s) * np.pi / 2) ** 2
    ac = ac / ac[0]
    expected = np.clip(1 - ac[1:] / ac[:-1], 0, 0.999)
    np.testing.assert_allclose(betas, expected, rtol=1e-12)
    assert betas.shape == (T,)
    assert (betas > 0).all() and (betas <= 0.999).all()


def test_linear_schedule_endpoints():
    betas = linear_beta_schedule(1000)
    assert np.isclose(betas[0], 1e-4)
    assert np.isclose(betas[-1], 0.02)


def test_buffers_consistency():
    sched = make_schedule(100, "cosine")
    ac = np.asarray(sched.alphas_cumprod)
    np.testing.assert_allclose(
        np.asarray(sched.sqrt_alphas_cumprod) ** 2, ac, rtol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(sched.sqrt_one_minus_alphas_cumprod) ** 2, 1 - ac, rtol=1e-4
    )
    # posterior variance identity: beta_t * (1 - acp_{t-1}) / (1 - acp_t)
    betas = np.asarray(sched.betas)
    acp_prev = np.asarray(sched.alphas_cumprod_prev)
    # Recomputing (1 - acp) from the fp32 buffers cancels catastrophically
    # near t=0 (acp ~ 1 - 6e-4), so allow ~1e-3 relative slack; the stored
    # buffer itself is computed in float64.
    np.testing.assert_allclose(
        np.asarray(sched.posterior_variance),
        betas * (1 - acp_prev) / (1 - ac),
        rtol=2e-3,
    )
    # mean coefs sum scaled: coef1 + coef2 * sqrt at x0=xt would reconstruct
    assert sched.num_timesteps == 100


def test_extract_broadcast():
    buf = jnp.arange(10.0)
    t = jnp.array([0, 3, 9])
    out = extract(buf, t, 4)
    assert out.shape == (3, 1, 1, 1)
    np.testing.assert_allclose(np.asarray(out).ravel(), [0, 3, 9])


def test_j_scheduler_constant_and_cosine():
    const = get_J_scheduler(None)
    assert const(5) == 1.0
    cos = get_J_scheduler("cosine")
    v0 = float(cos(0))
    v999 = float(cos(999))
    assert v999 > v0  # increasing schedule


def test_plain_cosine_j_scheduler():
    """Flipped plain cosine (reference: 1D/model/model_utils.py:173-180):
    t=0 gets the smallest step, increasing in t."""
    sched = get_J_scheduler("plain_cosine")
    x = np.linspace(0, 1000, 1001)
    table = np.cos(x / 1000)[::-1]
    np.testing.assert_allclose(float(sched(0)), table[0], rtol=1e-6)
    np.testing.assert_allclose(float(sched(500)), table[500], rtol=1e-6)
    np.testing.assert_allclose(float(sched(1000)), table[1000], rtol=1e-6)
    assert float(sched(999)) > float(sched(0))  # increasing in t


def test_w_scheduler_alias():
    from safediffcon_tpu.core.schedules import get_w_scheduler

    assert get_w_scheduler is get_J_scheduler
