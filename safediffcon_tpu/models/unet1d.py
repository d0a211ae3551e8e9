"""1D U-Net denoiser (channel-as-feature) for the tokamak task.

Topology of the reference Unet1D (reference: 1D/model/unet.py:428-563 and
tokamak/model/unet.py): conv over the 128-step trajectory length with the
12 physical channels as features; strided-conv downsampling; RMSNorm-based
pre-norm attention residuals.
"""
from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
import flax.linen as nn

from safediffcon_tpu.models.layers import (
    Attention,
    Downsample,
    LinearAttention,
    PreNormResidual,
    ResnetBlock,
    TimeMLP,
    Upsample,
)


class UNet1D(nn.Module):
    dim: int = 128
    dim_mults: Sequence[int] = (1, 2, 4, 8)
    channels: int = 12
    resnet_block_groups: int = 1
    attn_heads: int = 4
    attn_dim_head: int = 32
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, t):
        ndim = 1
        dt = self.compute_dtype
        x = x.astype(dt)
        groups = self.resnet_block_groups

        dty = None if dt == jnp.float32 else dt
        time_emb = TimeMLP(self.dim, self.dim * 4, dtype=dty)(t).astype(dt)

        x = nn.Conv(self.dim, kernel_size=(7,), padding="SAME", name="init_conv", dtype=dty)(x)
        r = x

        dims = [self.dim] + [self.dim * m for m in self.dim_mults]
        in_out = list(zip(dims[:-1], dims[1:]))
        num_res = len(in_out)

        h = []
        for i, (dim_in, dim_out) in enumerate(in_out):
            is_last = i >= num_res - 1
            x = ResnetBlock(dim_in, groups=groups, ndim=ndim, dtype=dty)(x, time_emb)
            h.append(x)
            x = ResnetBlock(dim_in, groups=groups, ndim=ndim, dtype=dty)(x, time_emb)
            x = PreNormResidual(
                LinearAttention(self.attn_heads, self.attn_dim_head, dtype=dty), use_layernorm=False
            )(x)
            h.append(x)
            if not is_last:
                x = Downsample(dim_out, ndim=ndim, dtype=dty)(x)
            else:
                x = nn.Conv(dim_out, kernel_size=(3,), padding="SAME", dtype=dty)(x)

        mid_dim = dims[-1]
        x = ResnetBlock(mid_dim, groups=groups, ndim=ndim, dtype=dty)(x, time_emb)
        x = PreNormResidual(
            Attention(self.attn_heads, self.attn_dim_head, dtype=dty), use_layernorm=False
        )(x)
        x = ResnetBlock(mid_dim, groups=groups, ndim=ndim, dtype=dty)(x, time_emb)

        for i, (dim_in, dim_out) in enumerate(reversed(in_out)):
            is_last = i == num_res - 1
            x = jnp.concatenate([x, h.pop()], axis=-1)
            x = ResnetBlock(dim_out, groups=groups, ndim=ndim, dtype=dty)(x, time_emb)
            x = jnp.concatenate([x, h.pop()], axis=-1)
            x = ResnetBlock(dim_out, groups=groups, ndim=ndim, dtype=dty)(x, time_emb)
            x = PreNormResidual(
                LinearAttention(self.attn_heads, self.attn_dim_head, dtype=dty), use_layernorm=False
            )(x)
            if not is_last:
                x = Upsample(dim_in, ndim=ndim, dtype=dty)(x)
            else:
                x = nn.Conv(dim_in, kernel_size=(3,), padding="SAME", dtype=dty)(x)

        x = jnp.concatenate([x, r], axis=-1)
        x = ResnetBlock(self.dim, groups=groups, ndim=ndim, dtype=dty)(x, time_emb)
        out = nn.Conv(self.channels, kernel_size=(1,), name="final_conv", dtype=dty)(x)
        return out.astype(jnp.float32)
