"""Packed (head-stacked full-MXU-tile) attention == per-head attention.

The UNet3D's production attention shapes (heads=4, dim_head=32, F=32)
run as 32x32x32 batched matmuls in the textbook layout — a diagnosed
MFU sink (BASELINE.md round-3 roofline). attn_impl="packed" stacks heads
into 128-row matmuls with block-diagonal masking; these tests pin that
the packing is EXACT (same params, same outputs) at module and full-model
level, so the on-chip A/B (experiments/profile_unet3d_mfu_r4.py) only
has to measure speed.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from safediffcon_tpu.models.unet3d import (
    SpatialLinearAttention3D, TemporalAttention, UNet3D, _rel_pos_buckets,
)


@pytest.mark.parametrize("with_bias", [True, False])
def test_temporal_attention_packed_matches_heads(with_bias):
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (2, 8, 3, 5, 48))  # B,F,H,W,C; F=8
    heads, dim_head = 4, 16
    pos_bias = (
        jax.random.normal(jax.random.PRNGKey(1), (heads, 8, 8))
        if with_bias else None
    )
    ref = TemporalAttention(heads, dim_head, attn_impl="heads")
    params = ref.init(jax.random.PRNGKey(2), x, pos_bias=pos_bias)
    out_ref = ref.apply(params, x, pos_bias=pos_bias)
    out_packed = TemporalAttention(heads, dim_head, attn_impl="packed").apply(
        params, x, pos_bias=pos_bias)
    np.testing.assert_allclose(np.asarray(out_packed), np.asarray(out_ref),
                               rtol=1e-5, atol=1e-5)


def test_spatial_linear_attention_packed_matches_heads():
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (2, 3, 6, 7, 40))
    ref = SpatialLinearAttention3D(4, 16, attn_impl="heads")
    params = ref.init(jax.random.PRNGKey(1), x)
    out_ref = ref.apply(params, x)
    out_packed = SpatialLinearAttention3D(4, 16, attn_impl="packed").apply(
        params, x)
    np.testing.assert_allclose(np.asarray(out_packed), np.asarray(out_ref),
                               rtol=1e-5, atol=1e-5)


def test_unet3d_forward_equal_across_attn_impl():
    """Same init params (identical pytrees across the flag), same output."""
    kw = dict(dim=16, dim_mults=(1, 2), channels=3, attn_heads=2,
              attn_dim_head=8, resnet_groups=4, use_remat=False)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 4, 8, 8, 3))
    t = jnp.array([5], jnp.int32)
    m_heads = UNet3D(attn_impl="heads", **kw)
    m_packed = UNet3D(attn_impl="packed", **kw)
    params = m_heads.init(jax.random.PRNGKey(1), x, t)
    p2 = m_packed.init(jax.random.PRNGKey(1), x, t)
    assert jax.tree_util.tree_structure(params) == jax.tree_util.tree_structure(p2)
    y_heads = m_heads.apply(params, x, t)
    y_packed = m_packed.apply(params, x, t)
    np.testing.assert_allclose(np.asarray(y_packed), np.asarray(y_heads),
                               rtol=2e-5, atol=2e-5)


def test_unet3d_grads_finite_packed():
    """-inf masking must not poison gradients (0 * inf = nan hazard)."""
    kw = dict(dim=16, dim_mults=(1, 2), channels=3, attn_heads=2,
              attn_dim_head=8, resnet_groups=4, use_remat=True,
              attn_impl="packed")
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 4, 8, 8, 3))
    t = jnp.array([5], jnp.int32)
    m = UNet3D(**kw)
    params = m.init(jax.random.PRNGKey(1), x, t)
    loss = lambda p: (m.apply(p, x, t) ** 2).mean()
    g = jax.grad(loss)(params)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(bool(jnp.isfinite(l).all()) for l in leaves)
