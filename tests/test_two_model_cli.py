"""Two-model composed sampling reachable from the CLI (VERDICT r4 missing #4).

The reference exposes a w-only prior model p(w | u0, uT) trained with
is_model_w (1D/model/diffusion.py:678-679,718-720) and composes it with the
main denoiser at inference via eval_two_models (:226-239). Here that surface
is: `burgers pretrain --model-w` (trains the prior into
<out>/burgers-pretrain-w) then `burgers eval --two-model --prior-beta B`
(samples via core.sampling.compose_two_model_apply).
"""
import json
import os

import numpy as np
import pytest


def test_model_w_training_masks_u_channel():
    """The w-model loss carries no u-channel gradient: perturbing the model's
    u-channel output must not change the loss (reference:
    model_out[..., 0, :, :] = target, 1D/model/diffusion.py:718-720)."""
    import jax
    import jax.numpy as jnp
    from safediffcon_tpu.core.diffusion import DiffusionConfig, p_losses
    from safediffcon_tpu.core.schedules import make_schedule
    from safediffcon_tpu.tasks.burgers.task import (
        COND_IDX, U, ModelWConditioner, mask_model_w_input,
    )

    rng = np.random.default_rng(0)
    x_start = jnp.asarray(rng.normal(size=(2, 16, 32, 3)), jnp.float32)
    noise = jnp.asarray(rng.normal(size=x_start.shape), jnp.float32)
    t = jnp.array([3, 7], jnp.int32)
    sched = make_schedule(10, "cosine")
    cfg = DiffusionConfig(timesteps=10)
    cond = ModelWConditioner()

    # input masking: the prior never sees u_1..u_{T-1}, u0/uT stay
    masked = mask_model_w_input(x_start)
    assert float(jnp.abs(masked[:, 1:COND_IDX, :, U]).max()) == 0.0
    assert np.allclose(masked[:, 0, :, U], x_start[:, 0, :, U])
    assert np.allclose(masked[:, COND_IDX, :, U], x_start[:, COND_IDX, :, U])

    def apply_with_u_bias(bias):
        # a fake model whose u-channel output shifts with `bias`
        def apply_fn(params, x, tt):
            return (x * 0.1).at[:, :, :, U].add(bias)
        return apply_fn

    def loss(bias):
        fn = apply_with_u_bias(bias)
        wrapped = lambda p, x, tt: fn(p, mask_model_w_input(x), tt)
        return p_losses(wrapped, None, sched, cfg, x_start, t, noise, cond).sum()

    l0, l1 = float(loss(0.0)), float(loss(5.0))
    assert l0 == pytest.approx(l1), "u-channel output must carry no loss"
    # and the f-channel still carries loss (the model IS trained on w)
    g = jax.grad(lambda s: p_losses(
        lambda p, x, tt: x * s, None, sched, cfg, x_start, t, noise, cond
    ).sum())(1.0)
    assert abs(float(g)) > 0


def test_two_model_cli_e2e(tmp_path):
    """Full CLI path: pretrain main + prior models, eval --two-model."""
    from safediffcon_tpu.cli.main import main
    from safediffcon_tpu.tasks.burgers.data import generate_burgers_dataset

    out = str(tmp_path)
    data = str(tmp_path / "b.npz")
    generate_burgers_dataset(data, n_train=16, n_cal=4, n_test=2, seed=0,
                             nx=32)
    common = ["--data", data, "--out", out, "--dim", "8", "--no-dp"]

    assert main(["burgers", "pretrain", "--steps", "2"] + common) == 0

    # main checkpoint exists but no w-model yet: the error is actionable
    with pytest.raises(SystemExit, match="no w-model checkpoint"):
        main(["burgers", "eval", "--two-model"] + common)

    assert main(["burgers", "pretrain", "--steps", "2", "--model-w"]
                + common) == 0
    assert os.path.isdir(os.path.join(out, "burgers-pretrain-w"))

    # composition must be eval-only (reference composes at inference)
    with pytest.raises(SystemExit, match="sampling/eval"):
        main(["burgers", "posttrain", "--two-model"] + common)

    assert main(["burgers", "eval", "--two-model", "--prior-beta", "0.5",
                 "--ddim-steps", "4"] + common) == 0
    with open(os.path.join(out, "burgers_eval_results.json")) as f:
        metrics = json.load(f)
    assert np.isfinite(metrics["control_mse_mean (J)"])

    # the composition changes the sampler output: prior_beta=1 reduces to
    # the single-model path, an intermediate beta must differ from it
    assert main(["burgers", "eval", "--two-model", "--prior-beta", "1.0",
                 "--ddim-steps", "4"] + common) == 0
    with open(os.path.join(out, "burgers_eval_results.json")) as f:
        metrics_b1 = json.load(f)
    assert main(["burgers", "eval", "--ddim-steps", "4"] + common) == 0
    with open(os.path.join(out, "burgers_eval_results.json")) as f:
        metrics_single = json.load(f)
    assert metrics_b1["control_mse_mean (J)"] == pytest.approx(
        metrics_single["control_mse_mean (J)"], rel=1e-4)
    assert metrics["control_mse_mean (J)"] != pytest.approx(
        metrics_single["control_mse_mean (J)"], rel=1e-6)
