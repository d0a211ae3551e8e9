"""The DPM-Solver++ fast-sampler option dispatches uniformly across all
three task pipelines, and calibration shares the test sampler (Q-hat
coverage requires it)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from safediffcon_tpu.core.sampling import ddim_sample, dpm_solver_sample


def test_tokamak_sampler_dispatch():
    from safediffcon_tpu.tasks.tokamak import TokamakConformalConfig, TokamakPipeline

    kw = dict(dim=8, dim_mults=(1, 2), groups=1)
    base = dict(cal_batch_size=2, num_cal_batch=1, n_cal_samples=2,
                n_test_samples=2, test_batch_size=2, ddim_sampling_steps=2,
                timesteps=4)
    p_ddim = TokamakPipeline(TokamakConformalConfig(**base), **kw)
    p_dpm = TokamakPipeline(TokamakConformalConfig(sampler="dpm", **base), **kw)
    assert p_ddim.sampler_fn is ddim_sample
    assert p_dpm.sampler_fn is dpm_solver_sample


def test_smoke_sampler_dispatch():
    from safediffcon_tpu.tasks.smoke import SmokeConformalConfig, SmokePipeline

    kw = dict(dim=8, dim_mults=(1, 2))
    base = dict(cal_batch_size=2, num_cal_batch=1, n_test_samples=2,
                test_batch_size=2, ddim_sampling_steps=2, timesteps=4)
    p_ddim = SmokePipeline(SmokeConformalConfig(**base), **kw)
    p_dpm = SmokePipeline(SmokeConformalConfig(sampler="dpm", **base), **kw)
    assert p_ddim.sampler_fn is ddim_sample
    assert p_dpm.sampler_fn is dpm_solver_sample


def test_smoke_dpm_sample_runs():
    """DPM sampling through the smoke pipeline's _sample_test program
    honors conditioning and produces finite physical-unit output."""
    from safediffcon_tpu.tasks.smoke import SmokeConformalConfig, SmokePipeline
    from safediffcon_tpu.tasks.smoke.data import RESCALER

    conf = SmokeConformalConfig(sampler="dpm", ddim_sampling_steps=2,
                                timesteps=4, cal_batch_size=2,
                                num_cal_batch=1, test_batch_size=2)
    pipe = SmokePipeline(conf, dim=8, dim_mults=(1, 2))
    from safediffcon_tpu.tasks.smoke.pipeline import init_params

    params = init_params(pipe.model, jax.random.PRNGKey(0), frames=4, size=8)
    state = jnp.asarray(
        np.random.default_rng(0).normal(size=(2, 4, 8, 8, 7)).astype(np.float32))
    out = pipe._sample_test(params, jax.random.PRNGKey(1), state,
                            jnp.zeros(()), guided=True)
    assert out.shape == state.shape
    assert np.isfinite(np.asarray(out)).all()
    # with an explicit control, the post-loop control re-imposition holds
    # in physical units (diffusion_2d.py:400-402 semantics)
    from safediffcon_tpu.tasks.smoke.task import CX, CY

    control = state[..., CX : CY + 1]
    out_c = pipe._sample_test(params, jax.random.PRNGKey(1), state,
                              jnp.zeros(()), guided=False, control=control)
    r = np.asarray(RESCALER)[CX : CY + 1]
    np.testing.assert_allclose(np.asarray(out_c[..., CX : CY + 1]),
                               np.asarray(control) * r, rtol=1e-4, atol=1e-4)
