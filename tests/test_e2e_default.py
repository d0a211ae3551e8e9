"""Default-suite (non-slow) end-to-end smoke tests — one per task.

Round-3 verdict: the default gate exercised no real pipeline, so a
regression in a phase ordering / conformal wiring would survive
`pytest -q`. These are the smallest possible configs of the full flows
(datagen -> pretrain -> calibrate -> finetune epoch -> solver evaluate);
the thorough variants live in the slow-marked test_e2e_{burgers,tokamak,
smoke}.py. Budget: aim for tens of seconds per task on CPU (dominated by
jit compiles of the tiny U-Nets + samplers).

Reference flows covered: 1D/scripts/base_posttrain.sh,
tokamak/scripts/posttrain.sh, 2d/scripts/posttrain.sh.
"""
import numpy as np
import jax
import pytest


def test_burgers_pipeline_wiring(tmp_path):
    from safediffcon_tpu.tasks.burgers.config import (
        BurgersConformalConfig, BurgersPostTrainConfig, BurgersPretrainConfig,
    )
    from safediffcon_tpu.tasks.burgers.data import (
        BurgersDataset, generate_burgers_dataset,
    )
    from safediffcon_tpu.tasks.burgers.pipeline import (
        BurgersPipeline, posttrain, pretrain,
    )

    path = str(tmp_path / "b.npz")
    # nx=32 (not 16): the coarser grid produced solver-exploding controls
    # from the barely-trained net; 32 matches the proven slow-e2e config
    generate_burgers_dataset(path, n_train=4, n_cal=4, n_test=2, seed=0, nx=32)
    train = BurgersDataset.load(path, "train")
    cal = BurgersDataset.load(path, "cal")
    test = BurgersDataset.load(path, "test")

    pre = BurgersPretrainConfig(dim=8, dim_mults=(1, 2), batch_size=2,
                                train_num_steps=2, cosine_t_max=2,
                                checkpoint_every=10**9)
    state = pretrain(pre, train, num_steps=2)

    # timesteps stays 1000 (the 4-step schedule produced solver-exploding
    # samples from the barely-trained net); DDIM 4 keeps sampling cheap
    ccfg = BurgersConformalConfig(
        cal_batch_size=4, num_cal_batch=1, n_cal_samples=4, n_test_samples=2,
        test_batch_size=2, ddim_sampling_steps=4, w_score=5.0)
    pipe = BurgersPipeline(ccfg, dim=8, dim_mults=(1, 2))
    pt = BurgersPostTrainConfig(conformal=ccfg, finetune_epoch=1,
                                finetune_steps=1, finetune_batch_size=2,
                                finetune_subset_size=4)
    st, Q, hist = posttrain(pt, pipe, state.params, train, cal, test,
                            eval_every_subset_epoch=False)
    assert np.isfinite(float(Q))
    assert len(hist) == 1 and np.isfinite(hist[-1]["loss"])
    ev = pipe.evaluate(st.ema_params, test, Q, jax.random.PRNGKey(1))
    assert np.isfinite(ev["control_mse_mean (J)"])
    assert np.isfinite(ev["sample_exceed_ratio (R_s)"])


def test_tokamak_pipeline_wiring(tmp_path):
    from safediffcon_tpu.tasks.tokamak import (
        TokamakConformalConfig, TokamakDataset, TokamakInferenceConfig,
        TokamakPipeline, TokamakPretrainConfig, generate_tokamak_dataset,
        pretrain, run_inference,
    )

    path = str(tmp_path / "t.npz")
    generate_tokamak_dataset(path, n_train=4, n_cal=4, n_test=2, gen_batch=10)
    data = {s: TokamakDataset.load(path, s) for s in ("train", "cal", "test")}

    pre = TokamakPretrainConfig(dim=8, dim_mults=(1, 2),
                                resnet_block_groups=1,
                                timesteps=4, batch_size=2,
                                checkpoint_every=10**9)
    state = pretrain(pre, data["train"], num_steps=2)

    ccfg = TokamakConformalConfig(
        cal_batch_size=4, num_cal_batch=1, n_cal_samples=4, n_test_samples=2,
        test_batch_size=2, ddim_sampling_steps=2, timesteps=4)
    pipe = TokamakPipeline(ccfg, dim=8, dim_mults=(1, 2), groups=1)
    cfg = TokamakInferenceConfig(conformal=ccfg, finetune_epoch=1,
                                 finetune_steps=1)
    _, Q, hist = run_inference(cfg, pipe, state.params, data["train"],
                               data["cal"], data["test"])
    assert np.isfinite(float(Q))
    ev = hist[-1]["eval"]
    assert np.isfinite(ev["obj_mse_mean"])
    assert np.isfinite(ev["time_below_ratio"])


def test_smoke_pipeline_wiring(tmp_path):
    from safediffcon_tpu.tasks.smoke import (
        SmokeConformalConfig, SmokeDataset, SmokeInferenceConfig,
        SmokePipeline, SmokePretrainConfig, generate_smoke_dataset, pretrain,
        run_inference,
    )

    path = str(tmp_path / "s.npz")
    generate_smoke_dataset(path, n_train=3, n_cal=2, n_test=2, n_frames=8,
                           record_frames=4, space_scale=4, gen_batch=7,
                           accuracy=1e-3, max_iter=40)
    data = {s: SmokeDataset.load(path, s) for s in ("train", "cal", "test")}

    pre = SmokePretrainConfig(dim=8, dim_mults=(1, 2), timesteps=4,
                              batch_size=2, checkpoint_every=10**9)
    state = pretrain(pre, data["train"], num_steps=2)

    ccfg = SmokeConformalConfig(
        cal_batch_size=2, num_cal_batch=1, n_test_samples=2,
        test_batch_size=2, ddim_sampling_steps=2, timesteps=4, alpha=0.25,
        standard_fixed_ratio=10.0)
    pipe = SmokePipeline(ccfg, dim=8, dim_mults=(1, 2),
                         solver_accuracy=1e-3, solver_max_iter=40,
                         solver_time_scale=2, solver_space_scale=4)
    cfg = SmokeInferenceConfig(conformal=ccfg, finetune_epoch=1,
                               finetune_steps=1, finetune_batch_size=2)
    _, Q, hist = run_inference(cfg, pipe, state.ema_params, data["train"],
                               data["cal"], data["test"])
    assert np.isfinite(float(Q))
    ev = hist[-1]["eval"]
    assert np.isfinite(ev["J_target"])
    assert np.isfinite(ev["mse"])
