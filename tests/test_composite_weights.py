"""Composite conformal calibration weights (VERDICT round 1, Missing #3).

1D InfFT multiplies a second exp(-guidance(x, InfFT_Q)) factor when the
config pins InfFT_Q (reference: 1D/inference/conformal.py:67-73); tokamak
multiplies extra factors in train mode (use_guidance -> the same factor
squared) and test mode (posttrain checkpoint's quantile + finetune guidance
hyperparameters) (reference: tokamak/inference/conformal.py:84-100).

Each composite is pinned against a plain-numpy recomputation of the
reference weight formulas on the SAME sampled batch.
"""
import dataclasses

import numpy as np
import jax
import pytest

from safediffcon_tpu.tasks.burgers.config import BurgersConformalConfig
from safediffcon_tpu.tasks.burgers import task as btask
from safediffcon_tpu.tasks.burgers.pipeline import (
    BurgersPipeline,
    init_params as burgers_init,
)
from safediffcon_tpu.tasks.tokamak.config import TokamakConformalConfig
from safediffcon_tpu.tasks.tokamak import task as ttask
from safediffcon_tpu.tasks.tokamak.pipeline import (
    TokamakPipeline,
    init_params as tokamak_init,
)

pytestmark = pytest.mark.slow

TINY = dict(dim=8, dim_mults=(1, 2), groups=1)


def _np_burgers_weight(state, Q, u_bound, w_score, use_max_safety=True):
    s = (state * btask.SCALER)[:, : btask.NT, :, 2]
    stat = s.mean(axis=(-1, -2)) if use_max_safety else s.max(axis=(-1, -2))
    return np.exp(-np.maximum(stat + Q - u_bound**2, 0.0) * w_score)


def test_burgers_infft_q_composite():
    ccfg = BurgersConformalConfig(
        timesteps=10, ddim_sampling_steps=2, w_score=3.0, InfFT_Q=0.25
    )
    pipe = BurgersPipeline(ccfg, **TINY)
    params = burgers_init(pipe.model, jax.random.PRNGKey(0))
    state = np.random.default_rng(0).normal(
        size=(4, 16, 128, 3)
    ).astype(np.float32) * 0.1
    Q = 0.05
    _, w = pipe._cal_batch(params, jax.random.PRNGKey(1), state, Q)

    base = _np_burgers_weight(state, Q, ccfg.u_bound, ccfg.w_score)
    second = _np_burgers_weight(state, ccfg.InfFT_Q, ccfg.u_bound, ccfg.w_score)
    np.testing.assert_allclose(np.asarray(w), base * second, rtol=1e-5)

    # and without InfFT_Q the single factor is unchanged
    pipe0 = BurgersPipeline(dataclasses.replace(ccfg, InfFT_Q=None), **TINY)
    _, w0 = pipe0._cal_batch(params, jax.random.PRNGKey(1), state, Q)
    np.testing.assert_allclose(np.asarray(w0), base, rtol=1e-5)


def _np_tokamak_weight(state, target, Q, threshold, w_obj, w_safe, scaler):
    phys = (state * ttask.SCALER)[:, : ttask.NT, :3]
    obj = ((phys[:, :, 0] - target[:, :, 0]) ** 2).mean(-1) + (
        (phys[:, :, 2] - target[:, :, 2]) ** 2
    ).mean(-1)
    s = phys[:, :, 1].min(axis=-1)
    loss = w_obj * obj + w_safe * np.maximum(threshold - s + Q, 0.0)
    return np.exp(-loss * scaler)


@pytest.fixture(scope="module")
def tokamak_batch():
    rng = np.random.default_rng(1)
    state = rng.normal(size=(4, 128, 12)).astype(np.float32) * 0.1
    target = rng.normal(size=(4, 122, 3)).astype(np.float32)
    return state, target


def _tokamak_weights(ccfg, state, target, Q):
    pipe = TokamakPipeline(ccfg, **TINY)
    params = tokamak_init(pipe.model, jax.random.PRNGKey(0))
    _, w = pipe._cal_batch(params, jax.random.PRNGKey(1), state, target, Q)
    return np.asarray(w)


def test_tokamak_train_mode_composite(tokamak_batch):
    state, target = tokamak_batch
    Q = 0.1
    base_cfg = TokamakConformalConfig(
        timesteps=10, ddim_sampling_steps=2, guidance_scaler=2.0, w_obj=0.5
    )
    base = _np_tokamak_weight(state, target, Q, base_cfg.safety_threshold,
                              base_cfg.w_obj, base_cfg.w_safe,
                              base_cfg.guidance_scaler)
    w_plain = _tokamak_weights(base_cfg, state, target, Q)
    np.testing.assert_allclose(w_plain, base, rtol=1e-5)

    # train mode + use_guidance squares the factor
    # (reference: tokamak/inference/conformal.py:84-91)
    w_sq = _tokamak_weights(
        dataclasses.replace(base_cfg, use_guidance=True), state, target, Q
    )
    np.testing.assert_allclose(w_sq, base**2, rtol=1e-5)


def test_tokamak_test_mode_composite(tokamak_batch):
    state, target = tokamak_batch
    Q = 0.1
    ccfg = TokamakConformalConfig(
        timesteps=10, ddim_sampling_steps=2, guidance_scaler=2.0,
        finetune_set="test", wo_post_train=False,
        finetune_quantile=0.3, finetune_w_obj=0.25, finetune_w_safe=0.75,
        finetune_guidance_scaler=4.0,
    )
    w = _tokamak_weights(ccfg, state, target, Q)
    base = _np_tokamak_weight(state, target, Q, ccfg.safety_threshold,
                              ccfg.w_obj, ccfg.w_safe, ccfg.guidance_scaler)
    ft = _np_tokamak_weight(state, target, ccfg.finetune_quantile,
                            ccfg.safety_threshold, ccfg.finetune_w_obj,
                            ccfg.finetune_w_safe,
                            ccfg.finetune_guidance_scaler)
    np.testing.assert_allclose(w, base * ft, rtol=1e-5)

    # wo_post_train=True disables the extra factor
    w0 = _tokamak_weights(
        dataclasses.replace(ccfg, wo_post_train=True), state, target, Q
    )
    np.testing.assert_allclose(w0, base, rtol=1e-5)

