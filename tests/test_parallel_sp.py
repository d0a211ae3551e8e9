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
    activate_mesh,
    auto_mesh,
    get_mesh_2d,
    maybe_shard,
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


def test_frame_sharded_forward_packed_attn_matches(tiny):
    """attn_impl="packed" (head-stacked 128-tile matmuls) under the dp x sp
    mesh: the packing reshapes heads into the stacked-token axis while the
    frame axis stays sharded until the attention's all-gather — same params
    pytree, same output as the single-device per-head reference. Pins that
    the production fastest-config selection (experiments/queue_r4.sh) can
    pick packed without breaking the --sp path."""
    model, params, x, t = tiny
    ref = jax.jit(model.apply)(params, x, t)
    packed = UNet3D(dim=8, dim_mults=(1, 2), channels=4, attn_heads=2,
                    attn_dim_head=4, resnet_groups=1, use_remat=False,
                    attn_impl="packed")
    mesh = get_mesh_2d(2, 4)
    xs = shard_video(np.asarray(x), mesh)
    ps = replicate(params, mesh)
    out = jax.jit(packed.apply)(ps, xs, t)
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


def test_auto_mesh_sp_and_maybe_shard_video():
    """Production wiring: auto_mesh(sp=2) activates a (data, frames) mesh
    and maybe_shard(video=True) shards (B, F, ...) batches over both axes
    (the smoke pipeline's placement path under `--sp`); non-video calls and
    frame-indivisible shapes degrade to data-axis-only sharding."""
    mesh = auto_mesh(sp=2)
    try:
        assert mesh is not None and mesh.axis_names == ("data", FRAME_AXIS)
        dp = mesh.shape["data"]
        x = np.zeros((2 * dp, 4, 5, 5, 3), np.float32)
        xs = maybe_shard(x, video=True)
        assert xs.sharding.shard_shape(xs.shape) == (2, 2, 5, 5, 3)
        # non-video: frame axis left unsharded
        xp = maybe_shard(x)
        assert xp.sharding.shard_shape(xp.shape) == (2, 4, 5, 5, 3)
        # frame axis not divisible by sp: only the batch axis shards
        y = np.zeros((2 * dp, 3, 5, 3), np.float32)
        ys = maybe_shard(y, video=True)
        assert ys.sharding.shard_shape(ys.shape) == (2, 3, 5, 3)
    finally:
        activate_mesh(None)


def test_train_loop_sp_video_matches_unsharded():
    """run_train_loop(shard_video=True) under a 2-D mesh reproduces the
    unsharded result exactly (toy channel-mixing denoiser over (B, F, C)
    batches — the sharded axes are pure placement)."""
    from safediffcon_tpu.core.train import (
        TrainState, make_optimizer, run_train_loop,
    )

    apply_fn = lambda p, x, t: jnp.einsum("...c,cd->...d", x, p["w"]) + p["b"]
    params = {
        "w": jnp.eye(3) + 0.01 * jax.random.normal(jax.random.PRNGKey(0), (3, 3)),
        "b": jnp.zeros((3,)),
    }

    def step_fn(state, rng, batch):
        def loss_fn(p):
            noise = jax.random.normal(rng, batch.shape, dtype=batch.dtype)
            return jnp.mean((apply_fn(p, batch, None) - noise) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        return state.apply_gradients(grads), loss

    data = np.random.default_rng(0).normal(size=(32, 4, 16, 3)).astype(np.float32)

    def run():
        tx = make_optimizer("adam", 1e-3)
        state = TrainState.create(jax.tree.map(jnp.copy, params), tx)
        state = run_train_loop(
            step_fn, state, data, batch_take=8, num_steps=4,
            rng=jax.random.PRNGKey(1), seed=3, steps_per_call=2,
            shard_video=True,
        )
        return jax.tree.map(np.asarray, jax.device_get(state.params))

    p_single = run()
    mesh = get_mesh_2d(2, 2)
    prev = activate_mesh(mesh)
    try:
        p_sp = run()
    finally:
        activate_mesh(prev)
    np.testing.assert_allclose(p_single["w"], p_sp["w"], atol=2e-6)
    np.testing.assert_allclose(p_single["b"], p_sp["b"], atol=2e-6)
