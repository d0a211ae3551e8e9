"""End-to-end tiny-config test of the full 1D Burgers stack:
generate data -> pretrain -> calibrate -> posttrain -> InfFT -> evaluate.
CPU-runnable equivalent of the reference reproduce scripts
(reference: 1D/scripts/reproduce_InfFT.sh)."""
import dataclasses
import os

import numpy as np
import jax
import pytest

from safediffcon_tpu.tasks.burgers.config import (
    BurgersConformalConfig,
    BurgersInfFTConfig,
    BurgersPostTrainConfig,
    BurgersPretrainConfig,
)
from safediffcon_tpu.tasks.burgers.data import (
    BurgersDataset,
    generate_burgers_dataset,
)
from safediffcon_tpu.tasks.burgers.pipeline import (
    BurgersPipeline,
    inference_finetune,
    init_params,
    posttrain,
    pretrain,
)

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def tiny_dataset(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("data") / "burgers_tiny.npz")
    generate_burgers_dataset(path, n_train=16, n_cal=8, n_test=4, seed=0, nx=32)
    return path


def test_generate_and_load(tiny_dataset):
    train = BurgersDataset.load(tiny_dataset, "train")
    assert train.data.shape == (16, 16, 32, 3)
    assert np.isfinite(train.data).all()
    # normalization keeps values in a sane band
    assert np.abs(train.data).max() < 3.0
    # safety channel constant per sample (use_max_safety)
    s = train.data[:, :11, :, 2]
    assert np.allclose(s.std(axis=(1, 2)), 0, atol=1e-6)


def test_end_to_end_tiny(tiny_dataset):
    train = BurgersDataset.load(tiny_dataset, "train")
    cal = BurgersDataset.load(tiny_dataset, "cal")
    test = BurgersDataset.load(tiny_dataset, "test")

    pre_cfg = BurgersPretrainConfig(
        dim=8, dim_mults=(1, 2), batch_size=4, train_num_steps=4, cosine_t_max=4,
        checkpoint_every=1000,
    )
    state = pretrain(pre_cfg, train, num_steps=4)

    ccfg = BurgersConformalConfig(
        cal_batch_size=4, num_cal_batch=2, n_cal_samples=8, n_test_samples=4,
        test_batch_size=4, ddim_sampling_steps=4, w_score=5.0,
    )
    pipeline = BurgersPipeline(ccfg, dim=8, dim_mults=(1, 2))

    rng = jax.random.PRNGKey(0)
    Q = pipeline.calibrate(state.params, cal.data, 0.0, rng)
    assert np.isfinite(float(Q))

    metrics = pipeline.evaluate(state.params, test, Q, rng)
    for k in (
        "control_mse_mean (J)",
        "point_exceed_ratio (R_p)",
        "time_exceed_ratio (R_t)",
        "sample_exceed_ratio (R_s)",
    ):
        assert k in metrics and np.isfinite(metrics[k])

    # post-training: 1 epoch x 2 steps
    pt_cfg = BurgersPostTrainConfig(
        conformal=ccfg, finetune_epoch=2, finetune_steps=2, finetune_batch_size=4,
        finetune_subset_size=8,
    )
    state_pt, Q_pt, pt_metrics = posttrain(
        pt_cfg, pipeline, state.params, train, cal, test,
        eval_every_subset_epoch=False,
    )
    assert len(pt_metrics) == 2
    assert np.isfinite(float(Q_pt))

    # InfFT: 2 iters (1 finetune + 1 skipped final)
    ft_cfg = BurgersInfFTConfig(conformal=ccfg, InfFT_iters=2)
    state_ft, Q_ft, ft_metrics = inference_finetune(
        ft_cfg, pipeline, state.params, cal, test
    )
    assert len(ft_metrics) == 1
    assert np.isfinite(ft_metrics[0]["eval"]["control_mse_mean (J)"])


def test_posttrain_chunked_matches_structure(tiny_dataset):
    """steps_per_call > 1 runs the fused-scan path: same epoch structure,
    finite Q, same number of optimizer steps and eval cadence as k=1."""
    train = BurgersDataset.load(tiny_dataset, "train")
    cal = BurgersDataset.load(tiny_dataset, "cal")
    test = BurgersDataset.load(tiny_dataset, "test")

    pre_cfg = BurgersPretrainConfig(
        dim=8, dim_mults=(1, 2), batch_size=4, train_num_steps=2, cosine_t_max=4,
        checkpoint_every=1000,
    )
    state = pretrain(pre_cfg, train, num_steps=2, steps_per_call=2)

    ccfg = BurgersConformalConfig(
        cal_batch_size=4, num_cal_batch=1, n_cal_samples=4, n_test_samples=4,
        test_batch_size=4, ddim_sampling_steps=2, w_score=5.0,
    )
    pipeline = BurgersPipeline(ccfg, dim=8, dim_mults=(1, 2))

    # 1 epoch x 6 steps, chunk 4 -> one fused chunk + 2-step tail; eval
    # every subset epoch (subset 16 / batch 4 = every 4 steps)
    pt_cfg = BurgersPostTrainConfig(
        conformal=ccfg, finetune_epoch=1, finetune_steps=6, finetune_batch_size=4,
        finetune_subset_size=16, steps_per_call=4,
    )
    state_pt, Q_pt, pt_metrics = posttrain(
        pt_cfg, pipeline, state.params, train, cal, test,
        eval_every_subset_epoch=True,
    )
    assert int(state_pt.step) == 6
    assert np.isfinite(float(Q_pt))
    assert len(pt_metrics) == 1
    # one eval at it=4 (subset boundary); it=6 is epoch end, not a boundary
    assert len(pt_metrics[0]["eval_history"]) == 1


def test_posttrain_phase_resume_exact(tiny_dataset, tmp_path):
    """A crash-resumed posttrain run is bit-identical to an uninterrupted
    one (state_dir persists the full TrainState + Q per epoch; per-epoch
    fold_in RNG)."""
    train = BurgersDataset.load(tiny_dataset, "train")
    cal = BurgersDataset.load(tiny_dataset, "cal")
    test = BurgersDataset.load(tiny_dataset, "test")

    ccfg = BurgersConformalConfig(
        cal_batch_size=4, num_cal_batch=1, n_cal_samples=4, n_test_samples=4,
        test_batch_size=4, ddim_sampling_steps=2, w_score=5.0,
    )
    pipeline = BurgersPipeline(ccfg, dim=8, dim_mults=(1, 2))
    params = init_params(pipeline.model, jax.random.PRNGKey(3))
    pt_cfg = BurgersPostTrainConfig(
        conformal=ccfg, finetune_epoch=2, finetune_steps=2,
        finetune_batch_size=4, finetune_subset_size=8,
    )

    d = str(tmp_path / "pt_state")
    sA, QA, mA = posttrain(pt_cfg, pipeline, params, train, cal, test,
                           eval_every_subset_epoch=False, state_dir=d)

    # "crash" during epoch 1: drop its saved state, resume from epoch 0
    import shutil

    shutil.rmtree(os.path.join(d, "ckpt-1"))
    sB, QB, mB = posttrain(pt_cfg, pipeline, params, train, cal, test,
                           eval_every_subset_epoch=False, state_dir=d)
    # resumed run returns the FULL history (epoch 0 restored, epoch 1 re-run)
    assert [m["epoch"] for m in mB] == [0, 1]
    np.testing.assert_allclose(float(QA), float(QB), rtol=0, atol=0)
    for a, b in zip(jax.tree_util.tree_leaves(sA.ema_params),
                    jax.tree_util.tree_leaves(sB.ema_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
