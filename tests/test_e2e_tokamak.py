"""End-to-end tokamak pipeline on a tiny config: generate data with the
closed-loop JAX solver, pretrain a tiny UNet1D, calibrate Q-hat, run both
post-train and backward-finetune epochs, evaluate through the surrogate.

Covers the full reference flow (tokamak/pretrain.py + run_inference.py)
at toy scale.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from safediffcon_tpu.tasks.tokamak import (
    TokamakConformalConfig,
    TokamakDataset,
    TokamakInferenceConfig,
    TokamakPipeline,
    TokamakPretrainConfig,
    generate_tokamak_dataset,
    pretrain,
    run_inference,
)
from safediffcon_tpu.tasks.tokamak.task import (
    NT,
    N_STATES,
    TokamakConditioner,
    TokamakTaskConfig,
    conformal_score,
    guidance_loss,
    shift_weights,
)

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def tiny_data(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("tok") / "tokamak.npz")
    generate_tokamak_dataset(path, n_train=12, n_cal=8, n_test=4, gen_batch=24)
    return {
        split: TokamakDataset.load(path, split) for split in ("train", "cal", "test")
    }


def _tiny_conf(**kw):
    base = dict(
        cal_batch_size=8, num_cal_batch=1, n_cal_samples=8,
        n_test_samples=4, test_batch_size=4,
        ddim_sampling_steps=4, timesteps=8,
    )
    base.update(kw)
    return TokamakConformalConfig(**base)


@pytest.fixture(scope="module")
def tiny_pipeline():
    return TokamakPipeline(_tiny_conf(), dim=8, dim_mults=(1, 2), groups=1)


def test_dataset_shapes(tiny_data):
    d = tiny_data["train"]
    assert d.data.shape == (12, 128, 12)
    assert d.state_phys.shape == (12, 122, 3)
    # padding is zero
    assert (d.data[:, NT:, :N_STATES] == 0).all()
    assert (d.data[:, NT - 1 :, N_STATES:] == 0).all()
    # q95 normalized by 7 stays ~[0.5, 1.1]
    assert 0.3 < d.data[:, :NT, 1].mean() < 1.2


def test_conditioner_invariants(tiny_data):
    d = jnp.asarray(tiny_data["cal"].data)
    cond = TokamakConditioner(
        u0=d[:, 0, :3],
        uT=jnp.stack([d[:, :NT, 0], d[:, :NT, 2]], axis=-1),
        w=d[:, :, 3:],
    )
    noise = jax.random.normal(jax.random.PRNGKey(0), d.shape)
    out = cond.apply(noise)
    np.testing.assert_allclose(out[:, 0, :3], d[:, 0, :3], atol=1e-6)
    np.testing.assert_allclose(out[:, :NT, 0], d[:, :NT, 0], atol=1e-6)
    np.testing.assert_allclose(out[:, :NT, 2], d[:, :NT, 2], atol=1e-6)
    np.testing.assert_allclose(out[:, :, 3:], d[:, :, 3:], atol=1e-6)
    assert (np.asarray(out[:, NT:, :3]) == 0).all()


def test_guidance_lower_bound_semantics(tiny_data):
    """Safety cost decreases as q95 increases (lower-bound constraint)."""
    d = tiny_data["cal"]
    cfg = TokamakTaskConfig(w_obj=0.0, w_safe=1.0)
    x = jnp.asarray(d.data)
    tgt = jnp.asarray(d.state_phys)
    base = guidance_loss(x, tgt, 0.0, cfg)
    lifted = guidance_loss(x.at[:, :NT, 1].add(0.5), tgt, 0.0, cfg)
    assert (np.asarray(lifted) <= np.asarray(base) + 1e-6).all()
    # weights are exp(-loss)
    w = shift_weights(x, tgt, 0.0, cfg)
    np.testing.assert_allclose(np.asarray(w), np.exp(-np.asarray(base)), rtol=1e-5)


def test_conformal_score_matches_numpy(tiny_data):
    d = tiny_data["cal"]
    x = jnp.asarray(d.data)
    s = conformal_score(x, x)
    np.testing.assert_allclose(np.asarray(s), 0.0, atol=1e-6)


def test_end_to_end_tiny(tiny_data, tiny_pipeline):
    pre_cfg = TokamakPretrainConfig(
        dim=8, dim_mults=(1, 2), timesteps=8, batch_size=4,
        train_num_steps=6, checkpoint_every=10**9,
    )
    state = pretrain(pre_cfg, tiny_data["train"], num_steps=6)
    assert np.isfinite(float(state.step)) and int(state.step) == 6

    # post-train mode
    inf_cfg = TokamakInferenceConfig(
        conformal=_tiny_conf(), finetune_epoch=2, finetune_steps=2,
        train_batch_size=8,
    )
    params, Q, metrics = run_inference(
        inf_cfg, tiny_pipeline, state.ema_params,
        tiny_data["train"], tiny_data["cal"], tiny_data["test"],
    )
    assert len(metrics) == 2
    assert np.isfinite(metrics[-1]["eval"]["obj_mse_mean"])
    assert np.isfinite(float(Q))
    # weighted-loss finetuning moved the params
    leaf_pre = jax.tree_util.tree_leaves(state.ema_params)[0]
    leaf_post = jax.tree_util.tree_leaves(params)[0]
    assert not np.allclose(np.asarray(leaf_pre), np.asarray(leaf_post))

    # backward-finetune (InfFT) mode
    bf_cfg = TokamakInferenceConfig(
        conformal=_tiny_conf(), backward_finetune=True, finetune_epoch=1,
        finetune_steps=1,
    )
    params2, Q2, metrics2 = run_inference(
        bf_cfg, tiny_pipeline, params,
        None, tiny_data["cal"], tiny_data["test"],
    )
    assert np.isfinite(metrics2[-1]["eval"]["safety_score_mean"])
    assert np.isfinite(metrics2[-1]["loss"])
    # NOTE: with an UNTRAINED tiny model the backward loss's min-q95 cell
    # saturates the x_start clip (grad 0 there, as in the reference's
    # clamp_), so we assert the mechanism ran, not that params moved —
    # param movement is asserted on the posttrain path above.
