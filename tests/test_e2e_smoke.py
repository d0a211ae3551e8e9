"""End-to-end 2D smoke pipeline on a tiny config: generate data with the
JAX solver, pretrain a tiny UNet3D, calibrate (inverted-alpha quantile),
run posttrain and backward-finetune epochs, evaluate through the solver.

Covers the full reference flow (2d/train_2d.py + 2d/inference_2d.py) at
toy scale (8 frames of 64^2 from a 32-step 128^2 rollout).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from safediffcon_tpu.tasks.smoke import (
    SmokeConformalConfig,
    SmokeDataset,
    SmokeInferenceConfig,
    SmokePipeline,
    SmokePretrainConfig,
    generate_smoke_dataset,
    pretrain,
    run_inference,
)
from safediffcon_tpu.tasks.smoke.task import (
    CX,
    CY,
    SmokeConditioner,
    SmokeTaskConfig,
    guidance_values,
    shift_weights,
)

pytestmark = pytest.mark.slow

N_FRAMES = 32  # tiny rollout: 32 sim frames -> 8 record frames (scale 4)
TIME_SCALE = 4
SPACE_SCALE = 4  # 32^2 records for fast CPU compiles


@pytest.fixture(scope="module")
def tiny_data(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("smoke") / "smoke.npz")
    generate_smoke_dataset(
        path, n_train=6, n_cal=4, n_test=2, n_frames=N_FRAMES,
        record_frames=N_FRAMES // TIME_SCALE, space_scale=SPACE_SCALE, gen_batch=12,
        accuracy=1e-4, max_iter=80,
    )
    return {s: SmokeDataset.load(path, s) for s in ("train", "cal", "test")}


def _tiny_conf(**kw):
    base = dict(
        cal_batch_size=4, num_cal_batch=1, n_test_samples=2, test_batch_size=2,
        ddim_sampling_steps=3, timesteps=6, alpha=0.25,
        standard_fixed_ratio=10.0,
    )
    base.update(kw)
    return SmokeConformalConfig(**base)


@pytest.fixture(scope="module")
def tiny_pipeline():
    return SmokePipeline(
        _tiny_conf(), dim=8, dim_mults=(1, 2),
        solver_accuracy=1e-4, solver_max_iter=60, solver_time_scale=TIME_SCALE,
        solver_space_scale=SPACE_SCALE,
    )


def test_dataset_generation(tiny_data):
    d = tiny_data["train"]
    n_rec = N_FRAMES // TIME_SCALE
    assert d.data.shape == (6, n_rec, 32, 32, 7)
    # rates are in [0, 1] and spatially constant
    assert (d.raw[..., 5] >= 0).all() and (d.raw[..., 5] <= 1).all()
    assert np.allclose(d.raw[..., 6], d.raw[:, :, :1, :1, 6])
    # density conserved-ish at frame 0 (10x10 blob = 100 units, subsampled
    # by space_scale^2 -> ~100/16 at scale 4, +-grid alignment)
    expect = 100.0 / SPACE_SCALE**2
    np.testing.assert_allclose(
        d.raw[:, 0, :, :, 0].sum(axis=(-1, -2)), expect, atol=expect * 0.6
    )


def test_conditioner(tiny_data):
    d = jnp.asarray(tiny_data["cal"].data)
    cond = SmokeConditioner(init=d[:, 0, :, :, 0], control=d[..., CX : CY + 1])
    noise = jax.random.normal(jax.random.PRNGKey(0), d.shape)
    out = cond.apply(noise)
    np.testing.assert_allclose(out[:, 0, :, :, 0], d[:, 0, :, :, 0], atol=1e-6)
    np.testing.assert_allclose(out[..., CX : CY + 1], d[..., CX : CY + 1], atol=1e-6)


def test_guidance_semantics(tiny_data):
    """Raising the final-frame safe rate raises the guidance cost; raising
    the smoke success lowers it (w_safe < 1)."""
    cfg = SmokeTaskConfig(w_safe=0.9, safe_bound=0.0)
    x = jnp.asarray(tiny_data["cal"].data)
    base = guidance_values(x, 0.0, cfg)
    worse = guidance_values(x.at[:, -1, :, :, 6].add(0.5), 0.0, cfg)
    assert (np.asarray(worse) >= np.asarray(base) - 1e-6).all()
    better = guidance_values(x.at[..., 5].add(0.5), 0.0, cfg)
    assert (np.asarray(better) <= np.asarray(base) + 1e-6).all()
    w = shift_weights(x, 0.0, SmokeTaskConfig(w_safe=0.9, safe_bound=0.0,
                                              standard_fixed_ratio=2.0), "train")
    np.testing.assert_allclose(np.asarray(w), np.exp(-2.0 * np.asarray(base)), rtol=1e-5)


def test_end_to_end_tiny(tiny_data, tiny_pipeline):
    pre_cfg = SmokePretrainConfig(
        dim=8, dim_mults=(1, 2), timesteps=6, batch_size=3,
        checkpoint_every=10**9,
    )
    state = pretrain(pre_cfg, tiny_data["train"], num_steps=4)
    assert int(state.step) == 4

    # posttrain mode
    inf_cfg = SmokeInferenceConfig(
        conformal=_tiny_conf(), finetune_epoch=1, finetune_steps=2,
        finetune_batch_size=3,
    )
    epoch_records = []
    params, Q, metrics = run_inference(
        inf_cfg, tiny_pipeline, state.ema_params,
        tiny_data["train"], tiny_data["cal"], tiny_data["test"],
        on_epoch=epoch_records.append,
    )
    # incremental-persistence callback fires once per epoch with the record
    assert [r["epoch"] for r in epoch_records] == [m["epoch"] for m in metrics]
    assert epoch_records[-1] is metrics[-1]
    assert np.isfinite(metrics[-1]["eval"]["J_target"])
    assert np.isfinite(metrics[-1]["eval"]["mse"])
    assert np.isfinite(float(Q))
    leaf_pre = jax.tree_util.tree_leaves(state.ema_params)[0]
    leaf_post = jax.tree_util.tree_leaves(params)[0]
    assert not np.allclose(np.asarray(leaf_pre), np.asarray(leaf_post))

    # backward-finetune (InfFT) mode
    bf_cfg = SmokeInferenceConfig(
        conformal=_tiny_conf(use_guidance=False), backward_finetune=True,
        finetune_epoch=1, finetune_steps=1,
    )
    params2, Q2, metrics2 = run_inference(
        bf_cfg, tiny_pipeline, params, None, tiny_data["cal"], tiny_data["test"],
    )
    assert np.isfinite(metrics2[-1]["loss"])
    assert np.isfinite(metrics2[-1]["eval"]["J_target"])


def test_reweights_stats_path_matches_jit_path(tiny_data):
    """The host-stats reweights fast path must equal the original
    ship-the-tensors jit path (same formula, different reduction route)."""
    import jax.numpy as jnp

    from safediffcon_tpu.core.conformal import normalize_weights

    pipe = SmokePipeline(_tiny_conf(), dim=8, dim_mults=(1, 2),
                         solver_time_scale=TIME_SCALE,
                         solver_space_scale=SPACE_SCALE)
    train = tiny_data["train"]
    Q = 0.07
    fast = pipe.reweights(train, Q)
    slow = np.asarray(normalize_weights(
        pipe._weights_batch(jnp.asarray(train.data), jnp.asarray(Q))))
    np.testing.assert_allclose(fast, slow, rtol=2e-5)


def test_posttrain_device_pool_matches_host_stream(tiny_data):
    """run_inference with device_pool covering the whole train split must
    match the host-streamed path exactly (same sequential walk when the
    pool is the full set in original order? the pool is a random permutation
    — so compare final metrics for finiteness and Q equality instead)."""
    conf = _tiny_conf()
    pipe = SmokePipeline(conf, dim=8, dim_mults=(1, 2),
                         solver_time_scale=TIME_SCALE,
                         solver_space_scale=SPACE_SCALE)
    cfg = SmokeInferenceConfig(conformal=conf, finetune_epoch=1,
                               finetune_steps=2, finetune_batch_size=2,
                               device_pool=6)
    from safediffcon_tpu.tasks.smoke.pipeline import init_params

    params = init_params(pipe.model, jax.random.PRNGKey(0),
                         frames=N_FRAMES // TIME_SCALE, size=64 // SPACE_SCALE)
    p2, Q, hist = run_inference(cfg, pipe, params, tiny_data["train"],
                                tiny_data["cal"], tiny_data["test"])
    assert np.isfinite(float(Q))
    assert np.isfinite(hist[-1]["loss"])


def test_run_inference_resilient_fault_recovery(tiny_data, tmp_path, monkeypatch):
    """A simulated TPU-worker crash mid-phase (UNAVAILABLE at the pipeline
    seam, here epoch 1's calibration) is recovered in-code: the backend is
    re-initialized, the pipeline rebuilt via the factory, and the run
    resumes from the persisted epoch state — final params/Q bit-identical
    to an uninterrupted run."""
    from safediffcon_tpu.tasks.smoke.pipeline import (
        init_params, run_inference_resilient,
    )
    from safediffcon_tpu.utils import faults

    # the fault is simulated, the CPU backend is fine — don't actually drop
    # it (other tests in this process hold live device arrays)
    monkeypatch.setattr(faults, "reinit_backend", lambda: None)

    conf = _tiny_conf()
    pipe_kw = dict(dim=8, dim_mults=(1, 2), solver_accuracy=1e-4,
                   solver_max_iter=60, solver_time_scale=TIME_SCALE,
                   solver_space_scale=SPACE_SCALE)
    params = init_params(SmokePipeline(conf, **pipe_kw).model,
                         jax.random.PRNGKey(0),
                         frames=N_FRAMES // TIME_SCALE, size=64 // SPACE_SCALE)
    cfg2 = SmokeInferenceConfig(conformal=conf, finetune_epoch=2,
                                finetune_steps=2, finetune_batch_size=3)

    pA, QA, hA = run_inference(
        cfg2, SmokePipeline(conf, **pipe_kw), params,
        tiny_data["train"], tiny_data["cal"], tiny_data["test"])

    calls = {"n": 0}

    class FaultingPipeline(SmokePipeline):
        def calibrate(self, *a, **kw):
            calls["n"] += 1
            if calls["n"] == 2:  # epoch 1's calibration, after epoch 0 saved
                raise jax.errors.JaxRuntimeError(
                    "UNAVAILABLE: TPU worker process crashed or restarted "
                    "(simulated)")
            return super().calibrate(*a, **kw)

    pB, QB, hB = run_inference_resilient(
        cfg2, lambda: FaultingPipeline(conf, **pipe_kw), params,
        tiny_data["train"], tiny_data["cal"], tiny_data["test"],
        state_dir=str(tmp_path / "fault_state"), backoff_s=0.0)

    assert calls["n"] >= 3  # faulted once, then epoch 1 cal re-ran
    assert [h["epoch"] for h in hB] == [0, 1]
    np.testing.assert_allclose(float(QA), float(QB), rtol=0, atol=0)
    for a, b in zip(jax.tree_util.tree_leaves(pA), jax.tree_util.tree_leaves(pB)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # a NON-fault error must propagate immediately, not retry
    class BrokenPipeline(SmokePipeline):
        def calibrate(self, *a, **kw):
            raise ValueError("program bug")

    with pytest.raises(ValueError, match="program bug"):
        run_inference_resilient(
            cfg2, lambda: BrokenPipeline(conf, **pipe_kw), params,
            tiny_data["train"], tiny_data["cal"], tiny_data["test"],
            backoff_s=0.0)


def test_run_inference_phase_resume_exact(tiny_data, tiny_pipeline, tmp_path):
    """A crash-resumed posttrain phase is bit-identical to an uninterrupted
    one: per-epoch RNG is fold_in-derived and `state_dir` persists
    (params, optimizer moments, Q) at epoch granularity."""
    from safediffcon_tpu.tasks.smoke.pipeline import init_params

    conf = _tiny_conf()
    params = init_params(tiny_pipeline.model, jax.random.PRNGKey(0),
                         frames=N_FRAMES // TIME_SCALE, size=64 // SPACE_SCALE)

    cfg2 = SmokeInferenceConfig(conformal=conf, finetune_epoch=2,
                                finetune_steps=2, finetune_batch_size=3)
    pA, QA, hA = run_inference(cfg2, tiny_pipeline, params,
                               tiny_data["train"], tiny_data["cal"],
                               tiny_data["test"])

    d = str(tmp_path / "phase_state")
    cfg1 = SmokeInferenceConfig(conformal=conf, finetune_epoch=1,
                                finetune_steps=2, finetune_batch_size=3)
    run_inference(cfg1, tiny_pipeline, params, tiny_data["train"],
                  tiny_data["cal"], tiny_data["test"], state_dir=d)
    # "crash" after epoch 0: restart the 2-epoch run from the saved state
    pB, QB, hB = run_inference(cfg2, tiny_pipeline, params,
                               tiny_data["train"], tiny_data["cal"],
                               tiny_data["test"], state_dir=d)
    # resumed run returns the FULL history (epoch 0 restored, epoch 1 run)
    assert [h["epoch"] for h in hB] == [0, 1]
    np.testing.assert_allclose(float(QA), float(QB), rtol=0, atol=0)
    for a, b in zip(jax.tree_util.tree_leaves(pA), jax.tree_util.tree_leaves(pB)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_allclose(hA[-1]["eval"]["J_target"],
                               hB[-1]["eval"]["J_target"], rtol=0, atol=0)
