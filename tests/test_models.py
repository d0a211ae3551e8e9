import numpy as np
import jax
import jax.numpy as jnp

from safediffcon_tpu.models import UNet1D, UNet2D, UNet3D
import pytest

pytestmark = pytest.mark.slow


def test_unet2d_forward_shape():
    model = UNet2D(dim=16, dim_mults=(1, 2), channels=3, resnet_block_groups=1)
    x = jnp.zeros((2, 16, 32, 3))
    t = jnp.array([0, 5])
    params = model.init(jax.random.PRNGKey(0), x, t)
    out = model.apply(params, x, t)
    assert out.shape == x.shape
    assert out.dtype == jnp.float32


def test_unet2d_time_dependence():
    model = UNet2D(dim=16, dim_mults=(1, 2), channels=3, resnet_block_groups=1)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 16, 32, 3))
    params = model.init(jax.random.PRNGKey(0), x, jnp.array([0]))
    out0 = model.apply(params, x, jnp.array([0]))
    out9 = model.apply(params, x, jnp.array([900]))
    assert not np.allclose(np.asarray(out0), np.asarray(out9))


def test_unet1d_forward_shape():
    model = UNet1D(dim=16, dim_mults=(1, 2), channels=12, resnet_block_groups=1)
    x = jnp.zeros((2, 128, 12))
    t = jnp.array([3, 7])
    params = model.init(jax.random.PRNGKey(0), x, t)
    out = model.apply(params, x, t)
    assert out.shape == x.shape


def test_unet3d_forward_shape():
    model = UNet3D(dim=8, dim_mults=(1, 2), channels=7, resnet_groups=2,
                   attn_heads=2, attn_dim_head=8)
    x = jnp.zeros((1, 4, 16, 16, 7))
    t = jnp.array([11])
    params = model.init(jax.random.PRNGKey(0), x, t)
    out = model.apply(params, x, t)
    assert out.shape == x.shape
