"""3D (video) U-Net denoiser for the 2D smoke task.

Topology of the reference Unet3D_with_Conv3D
(reference: 2d/video_diffusion_pytorch/video_diffusion_pytorch_conv3d.py:357-574):
Conv3d residual blocks, factorized per-frame spatial linear attention +
temporal attention with rotary embeddings and a T5-style relative position
bias, spatial-only down/upsampling (frames preserved).

TPU re-design: layout (B, F, H, W, C); temporal attention is a batched
einsum over (B, H*W) x F tokens; relative-position buckets are computed in
numpy at trace time (static frame count) so only the bias embedding lives
on device.
"""
from __future__ import annotations

import math
from typing import Sequence

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from safediffcon_tpu.models.layers import ChanLayerNorm, TimeMLP


def _rel_pos_buckets(n: int, num_buckets: int = 32, max_distance: int = 128) -> np.ndarray:
    """T5 relative position buckets for an n x n attention map
    (reference: video_diffusion_pytorch_conv3d.py:86-104)."""
    q = np.arange(n)[:, None]
    k = np.arange(n)[None, :]
    rel = k - q
    neg = -rel
    num_buckets //= 2
    ret = (neg < 0).astype(np.int64) * num_buckets
    nabs = np.abs(neg)
    max_exact = num_buckets // 2
    is_small = nabs < max_exact
    val_if_large = max_exact + (
        np.log(np.maximum(nabs, 1) / max_exact)
        / math.log(max_distance / max_exact)
        * (num_buckets - max_exact)
    ).astype(np.int64)
    val_if_large = np.minimum(val_if_large, num_buckets - 1)
    return ret + np.where(is_small, nabs, val_if_large)


def _rope(x: jnp.ndarray, theta: float = 10000.0) -> jnp.ndarray:
    """Interleaved rotary position embedding over the token axis (axis -2)."""
    n, d = x.shape[-2], x.shape[-1]
    freqs = 1.0 / (theta ** (np.arange(0, d, 2, dtype=np.float64) / d))
    angles = np.arange(n)[:, None] * freqs[None, :]  # (n, d/2)
    cos = jnp.asarray(np.cos(angles), dtype=x.dtype)
    sin = jnp.asarray(np.sin(angles), dtype=x.dtype)
    x1 = x[..., 0::2]
    x2 = x[..., 1::2]
    rx1 = x1 * cos - x2 * sin
    rx2 = x1 * sin + x2 * cos
    return jnp.stack([rx1, rx2], axis=-1).reshape(x.shape)


class TemporalAttention(nn.Module):
    """Full attention over the frame axis with RoPE + relative position bias
    (reference: video_diffusion_pytorch_conv3d.py:277-353).

    attn_impl:
      - "heads": the textbook batched form — per-head (F, d) x (d, F)
        matmuls. At the production config (heads=4, dim_head=32, F=32)
        every matmul is 32x32x32, filling 1/4 of the MXU's 128 lanes and
        forcing relayouts between the four ops (the round-3 roofline's
        diagnosed MFU sink, BASELINE.md).
      - "packed": stack the H heads' tokens along one (H*F)-row axis and
        compute ONE (H*F, d) x (d, H*F) QK^T and ONE (H*F, H*F) x (H*F, d)
        PV per (batch, pixel). At the production config both are full
        128-row/128-col MXU tiles. Cross-head sim blocks are masked to
        -inf before the softmax, so the block-diagonal attention times the
        stacked V reproduces per-head attention EXACTLY (off-block attn
        weights are 0); 4x QK^T FLOP waste trades for full-tile MXU
        occupancy and two fused matmuls instead of eight tiny ones.
    """

    heads: int = 4
    dim_head: int = 32
    dtype: jnp.dtype = None
    attn_impl: str = "packed"  # "heads" | "packed"

    @nn.compact
    def __call__(self, x, pos_bias=None):
        # x: (B, F, H, W, C) -> tokens (B, H*W, F, C)
        b, f, hh, ww, c = x.shape
        t = x.transpose(0, 2, 3, 1, 4).reshape(b, hh * ww, f, c)

        hidden = self.heads * self.dim_head
        qkv = nn.Dense(hidden * 3, use_bias=False, dtype=self.dtype)(t)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def heads(z):  # (..., n, H*D) -> (..., H, n, D)
            return z.reshape(*z.shape[:-1], self.heads, self.dim_head).swapaxes(-3, -2)

        q, k, v = heads(q), heads(k), heads(v)
        q = q * (self.dim_head**-0.5)
        q = _rope(q)
        k = _rope(k)

        if self.attn_impl == "packed":
            hf = self.heads * f
            # (..., H, F, D) -> (..., H*F, D): head-major stacked tokens
            qp = q.reshape(*q.shape[:-3], hf, self.dim_head)
            kp = k.reshape(*k.shape[:-3], hf, self.dim_head)
            vp = v.reshape(*v.shape[:-3], hf, self.dim_head)
            sim = jnp.einsum("...id,...jd->...ij", qp, kp)  # (..., H*F, H*F)
            # additive mask: 0 on each head's own F x F block, -inf across
            # heads; the pos_bias (H, F, F) lands on the diagonal blocks.
            block = np.kron(np.eye(self.heads), np.ones((f, f)))
            neg = jnp.asarray(np.where(block, 0.0, -np.inf), dtype=sim.dtype)
            if pos_bias is not None:
                eye = jnp.asarray(np.eye(self.heads), pos_bias.dtype)
                neg = neg + jnp.einsum("gh,hij->gihj", eye, pos_bias).reshape(hf, hf)
            sim = sim + neg
            sim = sim - jax.lax.stop_gradient(sim.max(axis=-1, keepdims=True))
            attn = jax.nn.softmax(sim, axis=-1)
            out = jnp.einsum("...ij,...jd->...id", attn, vp)  # (..., H*F, D)
            out = out.reshape(*out.shape[:-2], self.heads, f, self.dim_head)
        else:
            sim = jnp.einsum("...hid,...hjd->...hij", q, k)
            if pos_bias is not None:
                sim = sim + pos_bias  # (H, F, F) broadcast over (B, HW)
            sim = sim - jax.lax.stop_gradient(sim.max(axis=-1, keepdims=True))
            attn = jax.nn.softmax(sim, axis=-1)
            out = jnp.einsum("...hij,...hjd->...hid", attn, v)
        out = out.swapaxes(-3, -2).reshape(b, hh * ww, f, hidden)
        out = nn.Dense(c, use_bias=False, dtype=self.dtype)(out)
        return out.reshape(b, hh, ww, f, c).transpose(0, 3, 1, 2, 4)


class SpatialLinearAttention3D(nn.Module):
    """Per-frame linear attention over H*W tokens
    (reference: video_diffusion_pytorch_conv3d.py:232-258).

    attn_impl "packed" stacks the heads' feature rows into one
    (H*D, N) matrix so the two context einsums become full-MXU-tile
    (128, N) x (N, 128) and (128, 128) x (128, N) matmuls instead of
    per-head 32-row ops; the cross-head blocks of the 128x128 context
    are zeroed, which reproduces per-head linear attention exactly
    (block-diagonal context times stacked q)."""

    heads: int = 4
    dim_head: int = 32
    dtype: jnp.dtype = None
    attn_impl: str = "packed"  # "heads" | "packed"

    @nn.compact
    def __call__(self, x):
        b, f, hh, ww, c = x.shape
        t = x.reshape(b * f, hh * ww, c)
        hidden = self.heads * self.dim_head
        qkv = nn.Dense(hidden * 3, use_bias=False, dtype=self.dtype)(t)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def heads(z):  # (B', N, H*D) -> (B', H, D, N)
            bb, n, _ = z.shape
            return z.reshape(bb, n, self.heads, self.dim_head).transpose(0, 2, 3, 1)

        q, k, v = heads(q), heads(k), heads(v)
        q = jax.nn.softmax(q, axis=-2)
        k = jax.nn.softmax(k, axis=-1)
        q = q * (self.dim_head**-0.5)
        if self.attn_impl == "packed":
            hd = self.heads * self.dim_head
            bb, _, _, n = q.shape
            qp = q.reshape(bb, hd, n)
            kp = k.reshape(bb, hd, n)
            vp = v.reshape(bb, hd, n)
            block = np.kron(np.eye(self.heads), np.ones((self.dim_head,) * 2))
            blk = jnp.asarray(block, dtype=qp.dtype)  # (H*D, H*D) 0/1
            context = jnp.einsum("bdn,ben->bde", kp, vp) * blk
            out = jnp.einsum("bde,bdn->ben", context, qp)  # (B', H*D, N)
            out = out.reshape(bb, self.heads, self.dim_head, n)
        else:
            context = jnp.einsum("bhdn,bhen->bhde", k, v)
            out = jnp.einsum("bhde,bhdn->bhen", context, q)
        bb, h, d, n = out.shape
        out = out.transpose(0, 3, 1, 2).reshape(bb, n, h * d)
        out = nn.Dense(c, dtype=self.dtype)(out)
        return out.reshape(b, f, hh, ww, c)


class FusedConv3x3x3(nn.Module):
    """Drop-in nn.Conv(kernel_size=(3,3,3), SAME) replacement backed by the
    Pallas im2col MXU kernel (ops/conv3d_mxu.py). Identical param pytree
    ('kernel' (3,3,3,Cin,Cout) + 'bias'), so checkpoints are
    interchangeable with the XLA path."""

    features: int
    dtype: jnp.dtype = None

    @nn.compact
    def __call__(self, x):
        from safediffcon_tpu.ops.conv3d_mxu import conv3d_fused

        cin = x.shape[-1]
        # params stay float32 (flax param_dtype convention — matches
        # nn.Conv, so checkpoints interchange); compute casts to dtype
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (3, 3, 3, cin, self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), jnp.float32)
        dt = self.dtype or x.dtype
        out = conv3d_fused(x.astype(dt), kernel.astype(dt))
        return out + bias.astype(dt)


class Block3D(nn.Module):
    dim_out: int
    groups: int = 8
    dtype: jnp.dtype = None
    conv_impl: str = "xla"  # "xla" (lax.conv) | "pallas" (fused im2col MXU)

    @nn.compact
    def __call__(self, x, scale_shift=None):
        if self.conv_impl == "pallas":
            x = FusedConv3x3x3(self.dim_out, dtype=self.dtype, name="Conv_0")(x)
        else:
            x = nn.Conv(self.dim_out, kernel_size=(3, 3, 3), padding="SAME",
                        dtype=self.dtype)(x)
        x = nn.GroupNorm(num_groups=self.groups, epsilon=1e-5, dtype=self.dtype)(x)
        if scale_shift is not None:
            scale, shift = scale_shift
            x = x * (scale + 1) + shift
        return nn.silu(x)


class ResnetBlock3D(nn.Module):
    dim_out: int
    groups: int = 8
    dtype: jnp.dtype = None
    conv_impl: str = "xla"
    # attention matmul layout: "heads" (per-head 32x32x32 batched matmuls)
    # | "packed" (head-stacked full-128-tile matmuls with block-diagonal
    # masking — see TemporalAttention/SpatialLinearAttention3D docstrings).
    # Param pytrees are identical across the flag (checkpoints interchange).
    attn_impl: str = "packed"

    @nn.compact
    def __call__(self, x, time_emb=None):
        scale_shift = None
        if time_emb is not None:
            h_t = nn.Dense(self.dim_out * 2, dtype=self.dtype)(nn.silu(time_emb))
            h_t = h_t.reshape(h_t.shape[0], 1, 1, 1, h_t.shape[-1])
            scale_shift = jnp.split(h_t, 2, axis=-1)
        h = Block3D(self.dim_out, groups=self.groups, dtype=self.dtype,
                    conv_impl=self.conv_impl)(x, scale_shift)
        h = Block3D(self.dim_out, groups=self.groups, dtype=self.dtype,
                    conv_impl=self.conv_impl)(h)
        if x.shape[-1] != self.dim_out:
            x = nn.Conv(self.dim_out, kernel_size=(1, 1, 1), dtype=self.dtype)(x)
        return h + x


class _PreNormResidual3D(nn.Module):
    fn: nn.Module

    @nn.compact
    def __call__(self, x, **kw):
        return self.fn(ChanLayerNorm()(x), **kw) + x


class UNet3D(nn.Module):
    dim: int = 64
    dim_mults: Sequence[int] = (1, 2, 4)
    channels: int = 7
    attn_heads: int = 4
    attn_dim_head: int = 32
    resnet_groups: int = 8
    compute_dtype: jnp.dtype = jnp.float32
    use_remat: bool = True  # rematerialize blocks: trade FLOPs for HBM
    # remat granularity: "full" recomputes everything inside each block in
    # the backward pass (minimum HBM, ~+30% recompute FLOPs measured on the
    # round-3 roofline); "save_heavy" saves conv/matmul OUTPUTS and only
    # recomputes the cheap elementwise tail (GroupNorm/silu/adds) — trades
    # a little HBM for skipping the expensive MXU recompute, the main lever
    # on the train-step MFU when the batch still fits.
    remat_policy: str = "full"
    # 3x3x3 conv implementation: "xla" (lax.conv, default) | "pallas"
    # (ops/conv3d_mxu.py fused im2col — full-lane K=27*C contractions;
    # opt-in until the on-chip A/B certifies a win). Param pytrees are
    # identical, so checkpoints interchange across the flag.
    conv_impl: str = "xla"
    # attention matmul layout: "heads" (per-head 32x32x32 batched matmuls)
    # | "packed" (head-stacked full-128-tile matmuls with block-diagonal
    # masking — see TemporalAttention/SpatialLinearAttention3D docstrings).
    # Param pytrees are identical across the flag (checkpoints interchange).
    attn_impl: str = "packed"

    @nn.compact
    def __call__(self, x, t):
        # x: (B, F, H, W, C)
        dt = self.compute_dtype
        dty = None if dt == jnp.float32 else dt
        x = x.astype(dt)
        f = x.shape[1]

        # Rematerialized block classes: activations of each residual block
        # are recomputed in the backward pass instead of stored, which is
        # what lets reference-scale training (batch 16, 32 frames, 64^2)
        # fit in one chip's HBM.
        if self.use_remat:
            if self.remat_policy == "save_heavy":
                # save every MXU-op output; recompute only VPU elementwise
                def _policy(prim, *_, **__):
                    return prim.name in ("conv_general_dilated", "dot_general")
            elif self.remat_policy == "full":
                _policy = None
            else:
                raise ValueError(f"unknown remat_policy {self.remat_policy!r}")
            RB3 = nn.remat(ResnetBlock3D, policy=_policy)
            PNR = nn.remat(_PreNormResidual3D, policy=_policy)
            # keep scope names identical to the un-rematted model so
            # checkpoints are interchangeable across the flag
            RB3.__name__ = "ResnetBlock3D"
            PNR.__name__ = "_PreNormResidual3D"
        else:
            RB3, PNR = ResnetBlock3D, _PreNormResidual3D

        # Relative position bias over frames (static buckets, learned embed).
        buckets = _rel_pos_buckets(f, num_buckets=32, max_distance=32)
        bias_table = nn.Embed(32, self.attn_heads, name="time_rel_pos_bias")(
            jnp.asarray(buckets)
        )  # (F, F, H)
        pos_bias = bias_table.transpose(2, 0, 1).astype(dt)  # (H, F, F)

        time_emb = TimeMLP(self.dim, self.dim * 4, dtype=dty)(t).astype(dt)

        x = nn.Conv(self.dim, kernel_size=(7, 7, 7), padding="SAME", name="init_conv", dtype=dty)(x)
        x = PNR(
            TemporalAttention(self.attn_heads, self.attn_dim_head, dtype=dty, attn_impl=self.attn_impl)
        )(x, pos_bias=pos_bias)
        r = x

        dims = [self.dim] + [self.dim * m for m in self.dim_mults]
        in_out = list(zip(dims[:-1], dims[1:]))
        num_res = len(in_out)

        h = []
        for i, (dim_in, dim_out) in enumerate(in_out):
            is_last = i >= num_res - 1
            x = RB3(dim_out, groups=self.resnet_groups, dtype=dty, conv_impl=self.conv_impl)(x, time_emb)
            x = RB3(dim_out, groups=self.resnet_groups, dtype=dty, conv_impl=self.conv_impl)(x, time_emb)
            x = PNR(
                SpatialLinearAttention3D(self.attn_heads, self.attn_dim_head, dtype=dty, attn_impl=self.attn_impl)
            )(x)
            x = PNR(
                TemporalAttention(self.attn_heads, self.attn_dim_head, dtype=dty, attn_impl=self.attn_impl)
            )(x, pos_bias=pos_bias)
            h.append(x)
            if not is_last:
                # Spatial-only downsample, k(1,4,4) s(1,2,2).
                x = nn.Conv(
                    dim_out,
                    kernel_size=(1, 4, 4),
                    strides=(1, 2, 2),
                    padding=((0, 0), (1, 1), (1, 1)),
                    dtype=dty,
                )(x)

        mid_dim = dims[-1]
        x = RB3(mid_dim, groups=self.resnet_groups, dtype=dty, conv_impl=self.conv_impl)(x, time_emb)
        # Mid spatial FULL attention per frame.
        b_, f_, hh_, ww_, c_ = x.shape

        class _MidSpatial(nn.Module):
            heads: int
            dim_head: int

            @nn.compact
            def __call__(self, z):
                b, ff, hh, ww, c = z.shape
                tkn = z.reshape(b * ff, hh * ww, c)
                hidden = self.heads * self.dim_head
                qkv = nn.Dense(hidden * 3, use_bias=False, dtype=dty)(tkn)
                q, k, v = jnp.split(qkv, 3, axis=-1)

                def heads(zz):
                    bb, n, _ = zz.shape
                    return zz.reshape(bb, n, self.heads, self.dim_head).transpose(0, 2, 1, 3)

                q, k, v = heads(q), heads(k), heads(v)
                q = q * (self.dim_head**-0.5)
                sim = jnp.einsum("bhid,bhjd->bhij", q, k)
                sim = sim - jax.lax.stop_gradient(sim.max(axis=-1, keepdims=True))
                attn = jax.nn.softmax(sim, axis=-1)
                out = jnp.einsum("bhij,bhjd->bhid", attn, v)
                bb, hd, n, d = out.shape
                out = out.transpose(0, 2, 1, 3).reshape(bb, n, hd * d)
                out = nn.Dense(c, use_bias=False, dtype=dty)(out)
                return out.reshape(b, ff, hh, ww, c)

        x = PNR(_MidSpatial(self.attn_heads, self.attn_dim_head))(x)
        x = PNR(
            TemporalAttention(self.attn_heads, self.attn_dim_head, dtype=dty, attn_impl=self.attn_impl)
        )(x, pos_bias=pos_bias)
        x = RB3(mid_dim, groups=self.resnet_groups, dtype=dty, conv_impl=self.conv_impl)(x, time_emb)

        for i, (dim_in, dim_out) in enumerate(reversed(in_out)):
            is_last = i >= num_res - 1
            x = jnp.concatenate([x, h.pop()], axis=-1)
            x = RB3(dim_in, groups=self.resnet_groups, dtype=dty, conv_impl=self.conv_impl)(x, time_emb)
            x = RB3(dim_in, groups=self.resnet_groups, dtype=dty, conv_impl=self.conv_impl)(x, time_emb)
            x = PNR(
                SpatialLinearAttention3D(self.attn_heads, self.attn_dim_head, dtype=dty, attn_impl=self.attn_impl)
            )(x)
            x = PNR(
                TemporalAttention(self.attn_heads, self.attn_dim_head, dtype=dty, attn_impl=self.attn_impl)
            )(x, pos_bias=pos_bias)
            if not is_last:
                # Spatial-only transposed-conv upsample, k(1,4,4) s(1,2,2).
                x = nn.ConvTranspose(
                    dim_in,
                    kernel_size=(1, 4, 4),
                    strides=(1, 2, 2),
                    padding="SAME",
                    dtype=dty,
                )(x)

        x = jnp.concatenate([x, r], axis=-1)
        x = RB3(self.dim, groups=self.resnet_groups, dtype=dty, conv_impl=self.conv_impl)(x)
        out = nn.Conv(self.channels, kernel_size=(1, 1, 1), name="final_conv", dtype=dty)(x)
        return out.astype(jnp.float32)
