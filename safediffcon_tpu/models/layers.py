"""Shared U-Net building blocks (flax.linen, channels-last).

Re-designs the reference torch blocks (reference: 1D/model/unet.py:16-258)
for TPU: NHWC/NLC layouts so XLA lowers convolutions straight onto the MXU,
attention as batched einsums over flattened spatial tokens, and norms over
the trailing channel axis.
"""
from __future__ import annotations

import math
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn


class RMSNorm(nn.Module):
    """Channel RMS norm: l2-normalize over channels, scale by g*sqrt(C)
    (reference: 1D/model/unet.py:45-51)."""

    @nn.compact
    def __call__(self, x):
        dim = x.shape[-1]
        g = self.param("g", nn.initializers.ones, (dim,))
        normed = x / jnp.clip(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-12)
        return normed * g * math.sqrt(dim)


class ChanLayerNorm(nn.Module):
    """Biasless LayerNorm over channels (reference: 1D/model/unet.py:53-63)."""

    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        dim = x.shape[-1]
        g = self.param("g", nn.initializers.ones, (dim,))
        var = jnp.var(x, axis=-1, keepdims=True)
        mean = jnp.mean(x, axis=-1, keepdims=True)
        return (x - mean) * jax.lax.rsqrt(var + self.eps) * g


class SinusoidalPosEmb(nn.Module):
    """Timestep embedding (reference: 1D/model/unet.py:81-107, even-dim path)."""

    dim: int
    theta: float = 10000.0

    @nn.compact
    def __call__(self, t):
        half_dim = self.dim // 2
        emb = math.log(self.theta) / (half_dim - 1)
        emb = jnp.exp(jnp.arange(half_dim) * -emb)
        emb = t.astype(jnp.float32)[:, None] * emb[None, :]
        return jnp.concatenate([jnp.sin(emb), jnp.cos(emb)], axis=-1)


class TimeMLP(nn.Module):
    """sinusoidal -> Linear -> GELU -> Linear (reference: 1D/model/unet.py:310-315)."""

    dim: int
    time_dim: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, t):
        x = SinusoidalPosEmb(self.dim)(t)
        x = nn.Dense(self.time_dim, dtype=self.dtype)(x)
        x = nn.gelu(x, approximate=False)
        x = nn.Dense(self.time_dim, dtype=self.dtype)(x)
        return x


class ConvBlock(nn.Module):
    """conv3 + GroupNorm + (scale,shift) + SiLU (reference: 1D/model/unet.py:128-147)."""

    dim_out: int
    groups: int = 8
    ndim: int = 2  # number of spatial dims
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, scale_shift=None):
        x = nn.Conv(self.dim_out, kernel_size=(3,) * self.ndim, padding="SAME",
                    dtype=self.dtype)(x)
        x = nn.GroupNorm(num_groups=self.groups, epsilon=1e-5, dtype=self.dtype)(x)
        if scale_shift is not None:
            scale, shift = scale_shift
            x = x * (scale + 1) + shift
        return nn.silu(x)


class ResnetBlock(nn.Module):
    """Two conv blocks with FiLM time conditioning + residual
    (reference: 1D/model/unet.py:149-180)."""

    dim_out: int
    time_emb: bool = True
    groups: int = 8
    ndim: int = 2
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, time_emb=None):
        scale_shift = None
        if self.time_emb and time_emb is not None:
            h_t = nn.Dense(self.dim_out * 2, dtype=self.dtype)(nn.silu(time_emb))
            h_t = h_t.reshape(h_t.shape[0], *((1,) * self.ndim), h_t.shape[-1])
            scale_shift = jnp.split(h_t, 2, axis=-1)

        h = ConvBlock(self.dim_out, groups=self.groups, ndim=self.ndim,
                      dtype=self.dtype)(x, scale_shift)
        h = ConvBlock(self.dim_out, groups=self.groups, ndim=self.ndim,
                      dtype=self.dtype)(h)

        if x.shape[-1] != self.dim_out:
            x = nn.Conv(self.dim_out, kernel_size=(1,) * self.ndim, dtype=self.dtype)(x)
        return h + x


def _flatten_tokens(x):
    """(B, *spatial, C) -> (B, N, C) plus the spatial shape."""
    spatial = x.shape[1:-1]
    return x.reshape(x.shape[0], -1, x.shape[-1]), spatial


class LinearAttention(nn.Module):
    """Linear attention over all spatial positions
    (reference: 1D/model/unet.py:182-222). Channel-similarity formulation:
    softmax(q) over channels, softmax(k) over tokens, context = k v^T."""

    heads: int = 4
    dim_head: int = 32
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        dim = x.shape[-1]
        tokens, spatial = _flatten_tokens(x)
        hidden = self.heads * self.dim_head
        qkv = nn.Dense(hidden * 3, use_bias=False, dtype=self.dtype)(tokens)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def heads(z):  # (B, N, H*D) -> (B, H, D, N)
            b, n, _ = z.shape
            return z.reshape(b, n, self.heads, self.dim_head).transpose(0, 2, 3, 1)

        q, k, v = heads(q), heads(k), heads(v)
        q = jax.nn.softmax(q, axis=-2)  # over channel dim d
        k = jax.nn.softmax(k, axis=-1)  # over tokens n
        q = q * (self.dim_head**-0.5)
        context = jnp.einsum("bhdn,bhen->bhde", k, v)
        out = jnp.einsum("bhde,bhdn->bhen", context, q)  # (B, H, D, N)
        b, h, d, n = out.shape
        out = out.transpose(0, 3, 1, 2).reshape(b, n, h * d)
        out = nn.Dense(dim, dtype=self.dtype)(out)
        out = ChanLayerNorm()(out) if len(spatial) > 1 else RMSNorm()(out)
        return out.reshape(x.shape[0], *spatial, dim)


class Attention(nn.Module):
    """Full softmax attention over spatial tokens
    (reference: 1D/model/unet.py:224-258)."""

    heads: int = 4
    dim_head: int = 32
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        dim = x.shape[-1]
        tokens, spatial = _flatten_tokens(x)
        hidden = self.heads * self.dim_head
        qkv = nn.Dense(hidden * 3, use_bias=False, dtype=self.dtype)(tokens)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def heads(z):  # (B, N, H*D) -> (B, H, N, D)
            b, n, _ = z.shape
            return z.reshape(b, n, self.heads, self.dim_head).transpose(0, 2, 1, 3)

        q, k, v = heads(q), heads(k), heads(v)
        q = q * (self.dim_head**-0.5)
        sim = jnp.einsum("bhid,bhjd->bhij", q, k)
        attn = jax.nn.softmax(sim, axis=-1)
        out = jnp.einsum("bhij,bhjd->bhid", attn, v)
        b, h, n, d = out.shape
        out = out.transpose(0, 2, 1, 3).reshape(b, n, h * d)
        out = nn.Dense(dim, dtype=self.dtype)(out)
        return out.reshape(x.shape[0], *spatial, dim)


class PreNormResidual(nn.Module):
    """x + fn(norm(x)); RMSNorm for 1-d spatial, ChanLayerNorm otherwise
    (reference: 1D/model/unet.py:16-22,65-76)."""

    fn: nn.Module
    use_layernorm: bool = True

    @nn.compact
    def __call__(self, x):
        normed = ChanLayerNorm()(x) if self.use_layernorm else RMSNorm()(x)
        return self.fn(normed) + x


class Downsample(nn.Module):
    """Space-to-depth (p=2 per spatial dim) + 1x1 conv for ndim>=2
    (reference: 1D/model/unet.py:39-43); strided conv k4 s2 for ndim==1
    (reference: 1D/model/unet.py:30-31)."""

    dim_out: int
    ndim: int = 2
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        if self.ndim == 1:
            return nn.Conv(self.dim_out, kernel_size=(4,), strides=(2,),
                           padding=((1, 1),), dtype=self.dtype)(x)
        b = x.shape[0]
        c = x.shape[-1]
        spatial = x.shape[1:-1]
        # (B, 2h, 2w, C) -> (B, h, w, 4C): pixel-unshuffle, pure reshape ops.
        new_spatial = tuple(s // 2 for s in spatial)
        if self.ndim == 2:
            h, w = spatial
            x = x.reshape(b, h // 2, 2, w // 2, 2, c)
            x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // 2, w // 2, 4 * c)
        else:
            raise NotImplementedError(self.ndim)
        return nn.Conv(self.dim_out, kernel_size=(1,) * self.ndim, dtype=self.dtype)(x)


class Upsample(nn.Module):
    """Nearest 2x upsample + conv3 (reference: 1D/model/unet.py:24-37)."""

    dim_out: int
    ndim: int = 2
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        for ax in range(1, 1 + self.ndim):
            x = jnp.repeat(x, 2, axis=ax)
        return nn.Conv(self.dim_out, kernel_size=(3,) * self.ndim, padding="SAME",
                       dtype=self.dtype)(x)
