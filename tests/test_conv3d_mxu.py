"""Fused Pallas 3x3x3 conv parity tests (interpreter mode on CPU)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from safediffcon_tpu.ops.conv3d_mxu import (
    conv3d_fused, conv3d_reference,
)


@pytest.mark.parametrize("shape,cout,tile_h", [
    ((2, 4, 8, 8, 8), 8, 4),     # tiled H
    ((1, 3, 4, 8, 16), 8, 4),    # Cin != Cout
    ((1, 2, 4, 4, 4), 4, 4),     # single H tile
    ((1, 2, 12, 8, 8), 8, 8),    # H not divisible by tile_h hint -> tiles at 6
    ((1, 2, 5, 8, 8), 8, 4),     # prime H -> tiles at 1 (ADVICE r4)
])
def test_matches_xla_conv(shape, cout, tile_h):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=shape).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(3, 3, 3, shape[-1], cout))
                    .astype(np.float32) / np.sqrt(27 * shape[-1]))
    ref = conv3d_reference(x, k)
    out = conv3d_fused(x, k, tile_h, True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_gradients_match_xla():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(1, 3, 4, 8, 8)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(3, 3, 3, 8, 8)).astype(np.float32) / 15)
    co = jnp.asarray(rng.normal(size=(1, 3, 4, 8, 8)).astype(np.float32))

    def loss_fused(x_, k_):
        return (conv3d_fused(x_, k_, 4, True) * co).sum()

    def loss_ref(x_, k_):
        return (conv3d_reference(x_, k_) * co).sum()

    gx_f, gk_f = jax.grad(loss_fused, argnums=(0, 1))(x, k)
    gx_r, gk_r = jax.grad(loss_ref, argnums=(0, 1))(x, k)
    np.testing.assert_allclose(np.asarray(gx_f), np.asarray(gx_r),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(gk_f), np.asarray(gk_r),
                               rtol=2e-4, atol=2e-4)


def test_bf16_path_finite_and_close():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(1, 3, 8, 8, 8)), dtype=jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(3, 3, 3, 8, 8)) / 15, dtype=jnp.bfloat16)
    out = conv3d_fused(x, k, 8, True)
    assert out.dtype == jnp.bfloat16
    ref = conv3d_reference(x.astype(jnp.float32), k.astype(jnp.float32))
    assert np.isfinite(np.asarray(out, np.float32)).all()
    np.testing.assert_allclose(np.asarray(out, np.float32), np.asarray(ref),
                               rtol=0.1, atol=0.1)
