"""Pallas TPU kernel: fused 3x3x3 convolution via in-VMEM im2col.

Motivation (round-3 UNet3D roofline, BASELINE.md): the 2D smoke model's
3x3x3 convs at dim 64 contract only C=64 channels per kernel tap, which
half-fills the 128-lane MXU in BOTH the K and N dimensions — the
diagnosed cause of the ~11% train-step MFU. This kernel rebuilds the
contraction as ONE matmul per frame with K = 27*C (a full-lane multiple
for every U-Net level: 1728/3456/6912), assembling the im2col matrix in
VMEM so the 27x activation blow-up never touches HBM.

Reference op being accelerated: the Conv3d residual blocks of
2d/video_diffusion_pytorch/video_diffusion_pytorch_conv3d.py:357-574
(there: cuDNN Conv3d). This is an opt-in fast path for `models/unet3d.py`
(`conv_impl="pallas"`); the XLA `lax.conv_general_dilated` path stays the
default until the on-chip A/B (experiments/profile_unet3d_mfu_r4.py)
certifies a win.

Design:
  - x padded once in XLA to (B, F+2, H+2, W+2, C) (SAME, stride 1).
  - grid (B, H/TH): each program DMAs its (F+2, TH+2, W+2, C) halo block
    from HBM into VMEM, then loops over frames: 27 static halo slices are
    concatenated into an (TH*W, 27*C) im2col tile and hit the MXU as one
    dot against the (27*C, Cout) reshaped kernel, f32 accumulation.
  - all control flow is static (fori_loop over frames, unrolled 27-tap
    python loop) — same discipline as ops/pressure_cg.py v2.

Backward: custom_vjp. dL/dx is the SAME fused kernel applied to the
cotangent with the spatially-flipped, channel-transposed kernel (stride-1
SAME correlation identity); dL/dW falls back to XLA's conv (it is a
(27C x Cout)-sized reduction — one matmul worth of work, not the hot op).
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# static 27-tap offset table (df, dh, dw), each in {0, 1, 2}
OFFSETS = [(df, dh, dw) for df in range(3) for dh in range(3) for dw in range(3)]


def _make_kernel(F, TH, W, C, Cout, out_dtype):
    def kernel(x_hbm, w_ref, out_ref, halo, sem):
        b = pl.program_id(0)
        h = pl.program_id(1)
        dma = pltpu.make_async_copy(
            x_hbm.at[b, :, pl.ds(h * TH, TH + 2)], halo, sem)
        dma.start()
        dma.wait()

        def frame(f, carry):
            parts = [
                halo[pl.ds(f + df, 1), pl.ds(dh, TH), pl.ds(dw, W), :]
                .reshape(TH, W, C)
                for (df, dh, dw) in OFFSETS
            ]
            a = jnp.concatenate(parts, axis=-1).reshape(TH * W, 27 * C)
            o = jnp.dot(a, w_ref[:], preferred_element_type=jnp.float32)
            out_ref[0, pl.ds(f, 1)] = (
                o.reshape(1, TH, W, Cout).astype(out_dtype))
            return carry

        jax.lax.fori_loop(0, F, frame, 0)

    return kernel


@functools.partial(jax.jit, static_argnames=("tile_h", "interpret"))
def _conv3d_fused_fwd(x, w_flat, tile_h, interpret):
    """x: (B, F, H, W, C); w_flat: (27*C, Cout) from kernel (3,3,3,C,Cout)
    flattened in OFFSETS-major order. Returns (B, F, H, W, Cout)."""
    B, F, H, W, C = x.shape
    Cout = w_flat.shape[1]
    TH = min(tile_h, H)
    if H % TH != 0:
        raise ValueError(
            f"conv3d_fused: H={H} is not divisible by tile_h={TH}; call via "
            "conv3d_fused() which picks the largest divisor automatically")
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)))
    out = pl.pallas_call(
        _make_kernel(F, TH, W, C, Cout, x.dtype),
        grid=(B, H // TH),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # padded x stays in HBM
            pl.BlockSpec((27 * C, Cout), lambda b, h: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, F, TH, W, Cout),
                               lambda b, h: (b, 0, h, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, F, H, W, Cout), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((F + 2, TH + 2, W + 2, C), x.dtype),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(xp, w_flat)
    return out


def _flatten_kernel(kernel):
    """(3,3,3,C,Cout) -> (27*C, Cout) in OFFSETS-major order (df,dh,dw,c)."""
    k = kernel.reshape(27, *kernel.shape[3:])
    return k.reshape(27 * kernel.shape[3], kernel.shape[4])


def _flip_transpose(kernel):
    """Spatially flipped + channel-transposed kernel: correlating the
    cotangent with this reproduces conv-transpose for stride-1 SAME."""
    return kernel[::-1, ::-1, ::-1].transpose(0, 1, 2, 4, 3)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _conv3d_fused_vjp(x, kernel, tile_h, interpret):
    return _conv3d_fused_fwd(x, _flatten_kernel(kernel), tile_h, interpret)


def _fwd(x, kernel, tile_h, interpret):
    return _conv3d_fused_vjp(x, kernel, tile_h, interpret), (x, kernel)


def _bwd(tile_h, interpret, res, g):
    x, kernel = res
    # dL/dx: same fused kernel, flipped/transposed weights
    dx = _conv3d_fused_fwd(g, _flatten_kernel(_flip_transpose(kernel)),
                           tile_h, interpret)
    # dL/dW: one conv-sized reduction — XLA path (not the hot op)
    dw = jax.grad(
        lambda k: (jax.lax.conv_general_dilated(
            x.astype(jnp.float32), k.astype(jnp.float32),
            window_strides=(1, 1, 1), padding="SAME",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC")) *
            g.astype(jnp.float32)).sum()
    )(kernel).astype(kernel.dtype)
    return dx.astype(x.dtype), dw


_conv3d_fused_vjp.defvjp(_fwd, _bwd)


def conv3d_fused(x, kernel, tile_h: int = 8, interpret=None):
    """Fused stride-1 SAME 3x3x3 conv. x: (B,F,H,W,C) NDHWC;
    kernel: (3,3,3,C,Cout) (flax nn.Conv layout). Differentiable.
    interpret=None auto-selects: compiled on TPU, interpreter elsewhere
    (the kernel uses pltpu DMA, which only compiles for TPU).

    tile_h is a hint: the actual tile is the largest divisor of H that is
    <= tile_h, so any H works (H=12 tiles at 6, H=20 at 5, prime H at 1)
    instead of asserting (ADVICE r4). Production UNet shapes (64/32/16)
    tile at exactly tile_h."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    H = x.shape[2]
    th = max(1, min(tile_h, H))
    while H % th:
        th -= 1
    return _conv3d_fused_vjp(x, kernel, th, bool(interpret))


def conv3d_reference(x, kernel):
    """XLA reference for parity tests: stride-1 SAME NDHWC conv."""
    return jax.lax.conv_general_dilated(
        x, kernel, window_strides=(1, 1, 1), padding="SAME",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
