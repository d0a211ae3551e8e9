"""Pallas TPU kernel: masked-Poisson pressure solve by conjugate gradient.

Native-tier replacement for the reference's CUDA pressure_solve_op
(reference: 2d/phi/solver/cuda/src/pressure_solve_op.cu.cc — a cuBLAS CG
loop over a prebuilt sparse Laplacian; and laplace_op.cu.cc — the masked
matrix build). The TPU redesign fuses BOTH: the 5-point obstacle stencil is
applied on the fly as shifted elementwise multiplies (no matrix), and the
entire CG iteration runs in VMEM — one grid program per batch sample, so
every sample gets its own convergence test and zero HBM round-trips
between iterations.

The 127x127 pressure fields are zero-padded to (128, 128) for lane
alignment; the stencil coefficients are zero on the pad ring and at domain
edges, which also neutralizes the circular wrap of `pltpu.roll`.

Gradient: CG on the cotangent (A symmetric), mirroring
2d/phi/solver/sparse.py:106-112 — same convention as the XLA fallback in
`solvers/smoke.py`.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

PAD = 128  # padded field size (CELLS=127 -> 128 lanes)
CHUNK = 8  # samples per grid program: amortizes loop/control overhead on
           # the VPU while keeping 5 live fields x CHUNK x 64KB well under
           # the ~16MB VMEM budget


def _shift(x, shift, axis):
    # pltpu.roll requires non-negative shifts; a shift of -1 is PAD-1.
    # The circular wraparound is neutralized by the zero stencil ring.
    return pltpu.roll(x, shift=shift % x.shape[axis], axis=axis)


def _make_kernel(accuracy: float, max_iter: int):
    def kernel(div_ref, guess_ref, diag_ref, upy_ref, loy_ref, upx_ref, lox_ref, out_ref):
        diag = diag_ref[:]
        upy = upy_ref[:]
        loy = loy_ref[:]
        upx = upx_ref[:]
        lox = lox_ref[:]

        def apply_A(p):
            # p: (CHUNK, PAD, PAD); stencils broadcast over the chunk axis
            return (
                diag * p
                + upy * _shift(p, -1, 1)
                + loy * _shift(p, 1, 1)
                + upx * _shift(p, -1, 2)
                + lox * _shift(p, 1, 2)
            )

        rhs = div_ref[:]
        x0 = guess_ref[:]

        def cond(state):
            _, _, _, r, i = state
            return jnp.logical_and(jnp.abs(r).max() >= accuracy, i < max_iter)

        def body(state):
            x, m, am, r, i = state
            tmp = (m * am).sum()
            a = (m * r).sum() / tmp
            x = x + a * m
            r = r - a * am
            b = -(r * am).sum() / tmp
            m = r + b * m
            return x, m, apply_A(m), r, i + 1

        m0 = rhs - apply_A(x0)  # warm start: momentum = residual of the guess
        state = (x0, m0, apply_A(m0), m0, jnp.zeros((), jnp.int32))
        x, *_ = jax.lax.while_loop(cond, body, state)
        out_ref[:] = x

    return kernel


@partial(jax.jit, static_argnames=("accuracy", "max_iter", "interpret"))
def _cg_pallas(div_pad, guess_pad, diag, upy, loy, upx, lox, accuracy, max_iter, interpret):
    b = div_pad.shape[0]
    # pad the batch to a CHUNK multiple; each grid program solves CHUNK
    # samples with a joint convergence test (like the reference's batched
    # CG, 2d/phi/solver/base.py:81-100, but per-chunk instead of global)
    rem = (-b) % CHUNK
    if rem:
        zpad = jnp.zeros((rem,) + div_pad.shape[1:], div_pad.dtype)
        div_pad = jnp.concatenate([div_pad, zpad])
        guess_pad = jnp.concatenate([guess_pad, zpad])
    nb = div_pad.shape[0]
    stencil_spec = pl.BlockSpec(
        (PAD, PAD), lambda i: (0, 0), memory_space=pltpu.VMEM
    )
    out = pl.pallas_call(
        _make_kernel(accuracy, max_iter),
        grid=(nb // CHUNK,),
        in_specs=[
            pl.BlockSpec((CHUNK, PAD, PAD), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((CHUNK, PAD, PAD), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            stencil_spec, stencil_spec, stencil_spec, stencil_spec, stencil_spec,
        ],
        out_specs=pl.BlockSpec(
            (CHUNK, PAD, PAD), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct(div_pad.shape, div_pad.dtype),
        interpret=interpret,
    )(div_pad, guess_pad, diag, upy, loy, upx, lox)
    return out[:b]


def _pad2(x):
    """(..., 127, 127) -> (..., 128, 128) zero pad."""
    pad = [(0, 0)] * (x.ndim - 2) + [(0, PAD - x.shape[-2]), (0, PAD - x.shape[-1])]
    return jnp.pad(x, pad)


def _solve(masks, div, accuracy, max_iter, interpret, guess=None):
    cells = div.shape[-1]
    g = _pad2(guess) if guess is not None else jnp.zeros_like(_pad2(div))
    out = _cg_pallas(
        _pad2(div), g,
        _pad2(masks.diag), _pad2(masks.up_y), _pad2(masks.lo_y),
        _pad2(masks.up_x), _pad2(masks.lo_x),
        accuracy, max_iter, interpret,
    )
    return out[..., :cells, :cells]


@partial(jax.custom_vjp, nondiff_argnums=(0, 3, 4, 5))
def _pressure_solve_pallas_ws(masks, div, guess, accuracy, max_iter, interpret):
    return _solve(masks, div, accuracy, max_iter, interpret, guess)


def _fwd(masks, div, guess, accuracy, max_iter, interpret):
    return _solve(masks, div, accuracy, max_iter, interpret, guess), None


def _bwd(masks, accuracy, max_iter, interpret, _, g):
    # x = A^-1 div regardless of the warm start -> zero cotangent for guess
    return (_solve(masks, g, accuracy, max_iter, interpret), jnp.zeros_like(g))


_pressure_solve_pallas_ws.defvjp(_fwd, _bwd)


def pressure_solve_pallas(
    masks, div: jnp.ndarray, accuracy: float = 1e-6, max_iter: int = 500,
    interpret: bool = False, guess=None,
) -> jnp.ndarray:
    """Solve A p = div with VMEM-resident chunked-batch CG.

    masks: SmokeMasks (solvers.smoke.build_masks()); div: (B, 127, 127).
    `guess` warm-starts the solve. Set interpret=True for CPU tests.
    Differentiable: backward = CG on the cotangent (A symmetric), mirroring
    2d/phi/solver/sparse.py:106-112."""
    if guess is None:
        guess = jnp.zeros_like(div)
    return _pressure_solve_pallas_ws(masks, div, guess, accuracy, max_iter, interpret)
