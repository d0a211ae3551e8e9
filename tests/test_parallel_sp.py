"""Frame-axis sequence parallelism for the UNet3D (SURVEY §2.5 stretch
goal: the scaled 2D config is served by DP plus sharding the frame axis of
the 3D U-Net activations over the mesh).

The reference has no sequence parallelism (its only parallelism is
HF-Accelerate DDP, reference: 2d/default_config.yaml); this is TPU-native
capability beyond parity. Correctness is pure-annotation SPMD: the
(3,3,3) temporal convs need halo exchange and the temporal attention an
all-gather along frames, both inserted by XLA's partitioner — these tests
pin that a dp x sp sharded forward/backward is numerically identical to
single-device execution on the virtual CPU mesh.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from safediffcon_tpu.models.unet3d import UNet3D
from safediffcon_tpu.parallel.mesh import (
    FRAME_AXIS,
    get_mesh_2d,
    replicate,
    shard_video,
    video_sharding,
)

pytestmark = pytest.mark.skipif(
    jax.device_count() < 8, reason="needs the 8-virtual-device CPU mesh"
)


@pytest.fixture(scope="module")
def tiny():
    model = UNet3D(dim=8, dim_mults=(1, 2), channels=4, attn_heads=2,
                   attn_dim_head=4, resnet_groups=1, use_remat=False)
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (2, 8, 8, 8, 4))
    t = jnp.array([3, 7], jnp.int32)
    params = model.init(rng, x, t)
    return model, params, x, t


def test_video_sharding_spec(tiny):
    mesh = get_mesh_2d(2, 4)
    assert mesh.axis_names == ("data", FRAME_AXIS)
    model, params, x, t = tiny
    xs = shard_video(np.asarray(x), mesh)
    # batch split 2-way, frames split 4-way
    db = xs.sharding.shard_shape(xs.shape)
    assert db == (1, 2, 8, 8, 4)


def test_frame_sharded_forward_matches_single_device(tiny):
    model, params, x, t = tiny
    ref = jax.jit(model.apply)(params, x, t)

    mesh = get_mesh_2d(2, 4)
    xs = shard_video(np.asarray(x), mesh)
    ps = replicate(params, mesh)
    out = jax.jit(model.apply)(ps, xs, t)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.slow
def test_frame_sharded_grads_match_single_device(tiny):
    model, params, x, t = tiny
    noise = jax.random.normal(jax.random.PRNGKey(1), x.shape)

    def loss(p, xx, nn_):
        return jnp.mean((model.apply(p, xx, t) - nn_) ** 2)

    g_ref = jax.jit(jax.grad(loss))(params, x, noise)

    mesh = get_mesh_2d(2, 4)
    ps = replicate(params, mesh)
    xs = shard_video(np.asarray(x), mesh)
    ns = shard_video(np.asarray(noise), mesh)
    g = jax.jit(jax.grad(loss))(ps, xs, ns)
    flat_ref = jax.tree_util.tree_leaves(g_ref)
    flat = jax.tree_util.tree_leaves(g)
    for a, b in zip(flat, flat_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=1e-5)


def test_sp_only_mesh_odd_frames_divisible(tiny):
    """1 x 8 mesh (pure SP): batch axis unsharded, frames split 8-way."""
    model, params, x, t = tiny
    mesh = get_mesh_2d(1, 8)
    xs = shard_video(np.asarray(x), mesh)
    assert xs.sharding.shard_shape(xs.shape) == (2, 1, 8, 8, 4)
    out = jax.jit(model.apply)(replicate(params, mesh), xs, t)
    ref = jax.jit(model.apply)(params, x, t)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)
