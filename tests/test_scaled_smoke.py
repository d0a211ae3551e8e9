"""Scaled 2D smoke configuration (BASELINE.json config #5): native-128^2
records (space_scale=1), longer horizon, data-parallel batched sampling +
conformal calibration over the device mesh.

Runs at tiny frame counts / model width on the 8-virtual-device CPU mesh;
the same code paths scale to the real config (space_scale=1, F=32+).
"""
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

# The UNet3D compiles at native 128^2 take ~10 min on CPU; the model-touching
# tests are opt-in (RUN_SCALED_TESTS=1). The solver-only generation test is
# cheap and always runs.
heavy = pytest.mark.skipif(
    not os.environ.get("RUN_SCALED_TESTS"),
    reason="128^2 UNet3D CPU compile ~10min; set RUN_SCALED_TESTS=1",
)

from safediffcon_tpu.parallel.mesh import get_mesh, replicate, shard_batch
from safediffcon_tpu.tasks.smoke import (
    SmokeConformalConfig,
    SmokeDataset,
    SmokePipeline,
    generate_smoke_dataset,
)
from safediffcon_tpu.tasks.smoke.pipeline import init_params


@pytest.fixture(scope="module")
def scaled_data(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("scaled") / "smoke128.npz")
    # native 128^2 records (space_scale=1), 16 sim frames -> 4 record frames
    generate_smoke_dataset(
        path, n_train=4, n_cal=8, n_test=2, n_frames=16, record_frames=4,
        space_scale=1, gen_batch=14, accuracy=1e-4, max_iter=60,
    )
    return {s: SmokeDataset.load(path, s) for s in ("cal", "test")}


def test_native_128_records(scaled_data):
    d = scaled_data["cal"]
    assert d.data.shape == (8, 4, 128, 128, 7)
    # control interior band zeroed at native resolution ([16:112])
    assert (d.raw[:, :, 16:112, 16:112, 3:5] == 0).all()
    assert np.isfinite(d.raw).all()


@heavy
def test_sharded_calibration_on_mesh(scaled_data):
    """Conformal calibration of the scaled config with the cal batch
    sharded over the 8-device mesh: params replicated, batch axis split,
    XLA inserts the collectives."""
    conf = SmokeConformalConfig(
        cal_batch_size=8, num_cal_batch=1, ddim_sampling_steps=2, timesteps=4,
        alpha=0.25,
    )
    pipe = SmokePipeline(
        conf, dim=8, dim_mults=(1, 2), solver_accuracy=1e-3,
        solver_max_iter=30, solver_time_scale=4, solver_space_scale=1,
        cal_chunk=8,
    )
    params = init_params(pipe.model, jax.random.PRNGKey(0), frames=4, size=128)

    mesh = get_mesh()
    state = shard_batch(scaled_data["cal"].data, mesh)
    params_r = replicate(params, mesh)
    with mesh:
        scores, weights = pipe._cal_batch(
            params_r, jax.device_put(jax.random.PRNGKey(1), replicate(jnp.zeros(()), mesh).sharding),
            state, jnp.zeros(()),
        )
    scores.block_until_ready()
    assert scores.shape == (8,)
    assert bool(jnp.isfinite(scores).all()) and bool(jnp.isfinite(weights).all())
    # outputs sharded over the data axis
    assert not scores.sharding.is_fully_replicated


@heavy
def test_scaled_solver_eval(scaled_data):
    """Native-resolution solver evaluation of sampled controls."""
    conf = SmokeConformalConfig(
        cal_batch_size=2, num_cal_batch=1, ddim_sampling_steps=2, timesteps=4,
        alpha=0.25, test_batch_size=2,
    )
    pipe = SmokePipeline(
        conf, dim=8, dim_mults=(1, 2), solver_accuracy=1e-3,
        solver_max_iter=30, solver_time_scale=4, solver_space_scale=1,
    )
    params = init_params(pipe.model, jax.random.PRNGKey(0), frames=4, size=128)
    m = pipe.evaluate(params, scaled_data["test"], jnp.zeros(()), jax.random.PRNGKey(2))
    assert np.isfinite(m["J_target"]) and np.isfinite(m["mse"])
