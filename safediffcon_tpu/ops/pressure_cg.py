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
BLOCK_K = 32  # v2: fixed CG iterations per kernel call (static trip count)


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


def _make_block_kernel(k_iters: int):
    """v2 kernel: k_iters CG iterations with a STATIC trip count.

    Round 3 lost the TPU worker three times inside long programs running
    the v1 kernel, whose data-dependent ``lax.while_loop`` (convergence
    test in VMEM) is the prime-suspect construct. v2 removes all
    data-dependent control flow from the kernel: a ``fori_loop`` with a
    fixed trip count advances the CG state (x, momentum, A·momentum,
    residual); the convergence test lives at XLA level, which re-invokes
    the kernel until the global residual max is below accuracy. Division
    guards (safe-divide when momentum·A·momentum underflows to 0) keep the
    extra iterations on already-converged chunks NaN-free.
    """

    def kernel(x_ref, m_ref, r_ref, diag_ref, upy_ref, loy_ref, upx_ref,
               lox_ref, xo_ref, mo_ref, ro_ref):
        diag = diag_ref[:]
        upy = upy_ref[:]
        loy = loy_ref[:]
        upx = upx_ref[:]
        lox = lox_ref[:]

        def apply_A(p):
            return (
                diag * p
                + upy * _shift(p, -1, 1)
                + loy * _shift(p, 1, 1)
                + upx * _shift(p, -1, 2)
                + lox * _shift(p, 1, 2)
            )

        def body(_, state):
            x, m, am, r = state
            tmp = (m * am).sum()
            inv = jnp.where(tmp != 0.0, 1.0 / jnp.where(tmp != 0.0, tmp, 1.0), 0.0)
            a = (m * r).sum() * inv
            x = x + a * m
            r = r - a * am
            b = -(r * am).sum() * inv
            m = r + b * m
            return x, m, apply_A(m), r

        m0 = m_ref[:]
        state = (x_ref[:], m0, apply_A(m0), r_ref[:])
        x, m, _, r = jax.lax.fori_loop(0, k_iters, body, state)
        xo_ref[:] = x
        mo_ref[:] = m
        ro_ref[:] = r

    return kernel


def _apply_A_padded(diag, upy, loy, upx, lox, p):
    """XLA-level padded stencil apply (for the initial residual): identical
    math to the kernel's apply_A — jnp.roll's circular wrap is neutralized
    by the zero stencil ring, exactly like pltpu.roll in the kernel."""
    return (
        diag * p
        + upy * jnp.roll(p, -1, 1)
        + loy * jnp.roll(p, 1, 1)
        + upx * jnp.roll(p, -1, 2)
        + lox * jnp.roll(p, 1, 2)
    )


@partial(jax.jit, static_argnames=("accuracy", "max_iter", "interpret", "block_k"))
def _cg_pallas_v2(div_pad, guess_pad, diag, upy, loy, upx, lox, accuracy,
                  max_iter, interpret, block_k=BLOCK_K):
    b = div_pad.shape[0]
    rem = (-b) % CHUNK
    if rem:
        zpad = jnp.zeros((rem,) + div_pad.shape[1:], div_pad.dtype)
        div_pad = jnp.concatenate([div_pad, zpad])
        guess_pad = jnp.concatenate([guess_pad, zpad])
    nb = div_pad.shape[0]
    stencil_spec = pl.BlockSpec((PAD, PAD), lambda i: (0, 0),
                                memory_space=pltpu.VMEM)
    field_spec = pl.BlockSpec((CHUNK, PAD, PAD), lambda i: (i, 0, 0),
                              memory_space=pltpu.VMEM)
    shape = jax.ShapeDtypeStruct(div_pad.shape, div_pad.dtype)
    block = pl.pallas_call(
        _make_block_kernel(block_k),
        grid=(nb // CHUNK,),
        in_specs=[field_spec, field_spec, field_spec,
                  stencil_spec, stencil_spec, stencil_spec, stencil_spec,
                  stencil_spec],
        out_specs=(field_spec, field_spec, field_spec),
        out_shape=(shape, shape, shape),
        interpret=interpret,
    )

    # CG state at block granularity; the data-dependent convergence loop
    # runs at XLA level where a while_loop is a first-class citizen
    r0 = div_pad - _apply_A_padded(diag, upy, loy, upx, lox, guess_pad)

    def cond(state):
        _, _, r, i = state
        return jnp.logical_and(jnp.abs(r).max() >= accuracy, i < max_iter)

    def body(state):
        x, m, r, i = state
        x, m, r = block(x, m, r, diag, upy, loy, upx, lox)
        return x, m, r, i + block_k

    x, _, _, _ = jax.lax.while_loop(
        cond, body, (guess_pad, r0, r0, jnp.zeros((), jnp.int32)))
    return x[:b]


def _pad2(x):
    """(..., 127, 127) -> (..., 128, 128) zero pad."""
    pad = [(0, 0)] * (x.ndim - 2) + [(0, PAD - x.shape[-2]), (0, PAD - x.shape[-1])]
    return jnp.pad(x, pad)


def _solve(masks, div, accuracy, max_iter, interpret, guess=None,
           variant="v2"):
    cells = div.shape[-1]
    g = _pad2(guess) if guess is not None else jnp.zeros_like(_pad2(div))
    impl = _cg_pallas_v2 if variant == "v2" else _cg_pallas
    out = impl(
        _pad2(div), g,
        _pad2(masks.diag), _pad2(masks.up_y), _pad2(masks.lo_y),
        _pad2(masks.up_x), _pad2(masks.lo_x),
        accuracy, max_iter, interpret,
    )
    return out[..., :cells, :cells]


@partial(jax.custom_vjp, nondiff_argnums=(0, 3, 4, 5, 6))
def _pressure_solve_pallas_ws(masks, div, guess, accuracy, max_iter,
                              interpret, variant):
    return _solve(masks, div, accuracy, max_iter, interpret, guess, variant)


def _fwd(masks, div, guess, accuracy, max_iter, interpret, variant):
    return _solve(masks, div, accuracy, max_iter, interpret, guess, variant), None


def _bwd(masks, accuracy, max_iter, interpret, variant, _, g):
    # x = A^-1 div regardless of the warm start -> zero cotangent for guess
    return (_solve(masks, g, accuracy, max_iter, interpret, variant=variant),
            jnp.zeros_like(g))


_pressure_solve_pallas_ws.defvjp(_fwd, _bwd)


def pressure_solve_pallas(
    masks, div: jnp.ndarray, accuracy: float = 1e-6, max_iter: int = 500,
    interpret=None, guess=None, variant: str = "v2",
) -> jnp.ndarray:
    """Solve A p = div with VMEM-resident chunked-batch CG.

    masks: SmokeMasks (solvers.smoke.build_masks()); div: (B, 127, 127).
    `guess` warm-starts the solve. Set interpret=True for CPU tests.
    Differentiable: backward = CG on the cotangent (A symmetric), mirroring
    2d/phi/solver/sparse.py:106-112.

    variant="v2" (default) keeps all kernel control flow STATIC (fixed
    BLOCK_K-iteration kernel + XLA-level convergence loop — see
    _make_block_kernel); "v1" is the original all-in-VMEM data-dependent
    while_loop kernel, kept for the round-3 worker-fault A/B isolation.

    interpret=None auto-selects: compiled on TPU, interpreter elsewhere."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if guess is None:
        guess = jnp.zeros_like(div)
    return _pressure_solve_pallas_ws(masks, div, guess, accuracy, max_iter,
                                     bool(interpret), variant)
