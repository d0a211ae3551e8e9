"""Incompressible 2D smoke solver in pure JAX (PhiFlow replacement).

TPU-native re-design of the reference's vendored PhiFlow 0.x stack
(reference: 2d/phi/flow.py, 2d/phi/math/nd.py, 2d/phi/solver/sparse.py,
2d/apps/evaluate_solver.py). Everything is a pure function over batched
arrays:

  - MAC staggered grids are (B, 128, 128, 2) arrays (component 0 = x,
    1 = y, grid index [y, x]) over a 127x127 cell domain, exactly the
    reference layout (2d/phi/math/nd.py:312-331).
  - The masked pressure Poisson solve is a MATRIX-FREE conjugate-gradient
    with the reference's 5-point obstacle stencil
    (2d/phi/solver/sparse.py:27-80) applied as shifted elementwise
    multiplies — no sparse matrix, batched over samples, fully inside
    `lax.while_loop`, differentiable via `jax.custom_vjp` whose backward
    pass is a CG solve on the cotangent (2d/phi/solver/sparse.py:106-112).
    This replaces BOTH the scipy CG (per-sample host loops + process
    pools) and the CUDA custom ops (2d/phi/solver/cuda/).
  - Semi-Lagrangian advection backtraces cell centers through the
    averaged staggered velocity and bilinearly resamples with clamped
    (REPLICATE) coordinates (2d/phi/math/nd.py:407-445,
    2d/phi/math/scipy_backend.py:58-75).
  - The 256-step maze rollout with border-band indirect control and
    bucket absorption accounting (2d/apps/evaluate_solver.py:209-349) is
    one `lax.scan`, vmap-able over the batch — the reference's
    one-process-per-sample eval pool disappears.

Precision note: the reference solves CG in float64 to |residual| < 1e-8
(2d/apps/evaluate_solver.py:108, 2d/dataset/apps/a_gen_dataset_128.py:282).
On TPU we run float32. EVALUATION rollouts default to the reference's 1e-8
threshold (evaluate_control below, tasks/smoke/{pipeline,metrics}.py) so
reported metrics are computed at reference accuracy; DATA GENERATION
(tasks/smoke/data.py) keeps 1e-6 — the per-step projection error this
leaves (~1e-6) is far below the conservation-filter noise in the training
distribution, and the round-2..4 datasets/checkpoints were produced at
that tolerance (same-CPU head-to-head at 1e-8: BASELINE.md round 4).
Both run under the same 500-iteration cap as the reference.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

N = 128  # staggered resolution
CELLS = 127  # cell-centered resolution (reference domain [127, 127])


# ---------------------------------------------------------------------------
# Obstacle layout and masks (reference: 2d/apps/evaluate_solver.py:29-65)
# ---------------------------------------------------------------------------

OBSTACLES = [
    # (size_y, size_x), (origin_y, origin_x)
    ((1, 96), (16, 16)),     # bottom
    ((8, 1), (16, 16)),      # left down
    ((16, 1), (40, 16)),     # left medium
    ((40, 1), (72, 16)),     # left up
    ((8, 1), (16, 112)),     # right down
    ((16, 1), (40, 112)),    # right medium
    ((40, 1), (72, 112)),    # right up
    ((1, 8), (112, 16)),     # bucket walls
    ((1, 16), (112, 40)),
    ((1, 16), (112, 72)),
    ((1, 8), (112, 104)),
    ((16, 1), (64, 48)),     # y-axis obstacles
    ((16, 1), (96, 48)),
    ((16, 1), (64, 80)),
    ((16, 1), (96, 80)),
    ((1, 48), (40, 40)),     # x-axis (128-40-40 = 48)
]

# absorption buckets (y, x, dy, dx) (reference: get_bucket_mask, :114-135)
BUCKET_POS = [
    (112, 22, 15, 20), (112, 54, 15, 20), (112, 86, 15, 20),
    (22, 0, 20, 16), (54, 0, 20, 16), (22, 112, 20, 15), (54, 112, 20, 15),
]
TARGET_BUCKET = 1  # smoke_outs[1] is the target (reference :283)
SAFE_BOX = (40, 44, 24, 12)  # (reference: get_bucket_mask_safe, :148)


def fluid_mask() -> np.ndarray:
    """(CELLS, CELLS) float mask: 1 fluid, 0 obstacle."""
    m = np.ones((CELLS, CELLS), np.float32)
    for (sy, sx), (oy, ox) in OBSTACLES:
        m[oy : oy + sy, ox : ox + sx] = 0.0
    return m


class SmokeMasks(NamedTuple):
    """Precomputed static masks/stencils; close over them in jitted fns."""

    velocity_mask: jnp.ndarray  # (N, N, 2)
    diag: jnp.ndarray  # (CELLS, CELLS) CG diagonal
    up_y: jnp.ndarray  # off-diagonal stencils
    lo_y: jnp.ndarray
    up_x: jnp.ndarray
    lo_x: jnp.ndarray
    bucket_masks: jnp.ndarray  # (7, CELLS, CELLS)
    bucket_concat: jnp.ndarray  # (CELLS, CELLS)
    safe_masks: jnp.ndarray  # (8, CELLS, CELLS): safe box + 7 buckets
    safe_concat: jnp.ndarray


def build_masks() -> SmokeMasks:
    fm = fluid_mask()
    # The domain boundary is OPEN on all sides
    # (DomainBoundary([(True, True), (True, True)]),
    # 2d/apps/evaluate_solver.py:63): pad_fluid pads ONES (flow may exit),
    # while pad_active always pads ZEROS (no pressure unknowns outside)
    # (reference: 2d/phi/flow.py:414-422).
    fmp = np.pad(fm, 1, constant_values=1.0)  # fluid: open boundary
    amp = np.pad(fm, 1, constant_values=0.0)  # active

    # staggered velocity mask from the padded FLUID mask
    # (reference: 2d/phi/flow.py:455-473)
    mask_y = np.minimum(fmp[1:, 1:], fmp[:-1, 1:])
    mask_x = np.minimum(fmp[1:, 1:], fmp[1:, :-1])
    velocity_mask = np.stack([mask_x, mask_y], axis=-1)

    # CG 5-point stencil (reference: sparse_pressure_matrix,
    # 2d/phi/solver/sparse.py:27-80): off-diagonals from the ACTIVE mask,
    # diagonal from the FLUID mask (open boundary => Dirichlet p=0 outside)
    up_y = amp[2:, 1:-1] * amp[1:-1, 1:-1]
    lo_y = amp[:-2, 1:-1] * amp[1:-1, 1:-1]
    up_x = amp[1:-1, 2:] * amp[1:-1, 1:-1]
    lo_x = amp[1:-1, :-2] * amp[1:-1, 1:-1]
    center = -(fmp[2:, 1:-1] + fmp[:-2, 1:-1] + fmp[1:-1, 2:] + fmp[1:-1, :-2])
    diag = np.minimum(center, -1.0)

    def region_masks(regions):
        ms = np.zeros((len(regions), CELLS, CELLS), np.float32)
        for i, (y, x, dy, dx) in enumerate(regions):
            ms[i, y : min(y + dy, CELLS), x : min(x + dx, CELLS)] = 1.0
        return ms

    bucket_masks = region_masks(BUCKET_POS)
    safe_masks = region_masks([SAFE_BOX] + BUCKET_POS)
    return SmokeMasks(
        velocity_mask=jnp.asarray(velocity_mask),
        diag=jnp.asarray(diag),
        up_y=jnp.asarray(up_y),
        lo_y=jnp.asarray(lo_y),
        up_x=jnp.asarray(up_x),
        lo_x=jnp.asarray(lo_x),
        bucket_masks=jnp.asarray(bucket_masks),
        bucket_concat=jnp.asarray(bucket_masks.max(axis=0)),
        safe_masks=jnp.asarray(safe_masks),
        safe_concat=jnp.asarray(safe_masks.max(axis=0)),
    )


# ---------------------------------------------------------------------------
# Staggered-grid operators
# ---------------------------------------------------------------------------

def divergence(v: jnp.ndarray) -> jnp.ndarray:
    """(B, N, N, 2) staggered -> (B, CELLS, CELLS) cell divergence
    (reference: StaggeredGrid.divergence, 2d/phi/math/nd.py:367-377)."""
    vy, vx = v[..., 1], v[..., 0]
    return (vy[:, 1:, :-1] - vy[:, :-1, :-1]) + (vx[:, :-1, 1:] - vx[:, :-1, :-1])


def pressure_gradient(p: jnp.ndarray) -> jnp.ndarray:
    """(B, CELLS, CELLS) -> staggered (B, N, N, 2) via symmetric padding
    (reference: StaggeredGrid.gradient, 2d/phi/math/nd.py:603-615)."""
    pp = jnp.pad(p, ((0, 0), (1, 1), (1, 1)), mode="symmetric")
    gy = pp[:, 1:, 1:] - pp[:, :-1, 1:]
    gx = pp[:, 1:, 1:] - pp[:, 1:, :-1]
    return jnp.stack([gx, gy], axis=-1)


def _apply_A(masks: SmokeMasks, p: jnp.ndarray) -> jnp.ndarray:
    """Matrix-free masked 5-point Laplacian on (B, CELLS, CELLS)."""
    up_y = jnp.pad(p[:, 1:, :], ((0, 0), (0, 1), (0, 0)))
    lo_y = jnp.pad(p[:, :-1, :], ((0, 0), (1, 0), (0, 0)))
    up_x = jnp.pad(p[:, :, 1:], ((0, 0), (0, 0), (0, 1)))
    lo_x = jnp.pad(p[:, :, :-1], ((0, 0), (0, 0), (1, 0)))
    return (
        masks.diag * p
        + masks.up_y * up_y
        + masks.lo_y * lo_y
        + masks.up_x * up_x
        + masks.lo_x * lo_x
    )


def _cg(masks: SmokeMasks, rhs: jnp.ndarray, accuracy: float, max_iter: int,
        guess: Optional[jnp.ndarray] = None):
    """Conjugate gradient identical in structure to the reference
    (2d/phi/solver/base.py:56-110): residual-max termination, batched.
    `guess` warm-starts the solve (the reference supports initial_x at
    base.py:70-74 but always passes None; warm-starting from the previous
    frame's pressure cuts iterations severalfold in rollouts)."""

    def cond(state):
        _, _, _, residual, i = state
        return jnp.logical_and(jnp.abs(residual).max() >= accuracy, i < max_iter)

    def body(state):
        x, momentum, a_momentum, residual, i = state
        tmp = (momentum * a_momentum).sum()
        a = (momentum * residual).sum() / tmp
        x = x + a * momentum
        residual = residual - a * a_momentum
        b = -(residual * a_momentum).sum() / tmp
        momentum = residual + b * momentum
        return x, momentum, _apply_A(masks, momentum), residual, i + 1

    if guess is None:
        x0 = jnp.zeros_like(rhs)
        momentum = rhs
    else:
        x0 = guess
        momentum = rhs - _apply_A(masks, guess)
    state = (x0, momentum, _apply_A(masks, momentum), momentum,
             jnp.zeros((), jnp.int32))
    x, *_ = jax.lax.while_loop(cond, body, state)
    return x


@partial(jax.custom_vjp, nondiff_argnums=(0, 3, 4))
def _pressure_solve_ws(masks: SmokeMasks, div, guess, accuracy, max_iter):
    return _cg(masks, div, accuracy, max_iter, guess)


def _pressure_solve_ws_fwd(masks, div, guess, accuracy, max_iter):
    return _cg(masks, div, accuracy, max_iter, guess), None


def _pressure_solve_ws_bwd(masks, accuracy, max_iter, _, g):
    # x = A^-1 div independent of the warm start -> zero cotangent for guess
    return (_cg(masks, g, accuracy, max_iter), jnp.zeros_like(g))


_pressure_solve_ws.defvjp(_pressure_solve_ws_fwd, _pressure_solve_ws_bwd)


def pressure_solve(
    masks: SmokeMasks, div: jnp.ndarray, accuracy: float = 1e-6,
    max_iter: int = 500, guess: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Solve the masked Poisson equation A p = div.

    Backward pass = CG solve of the incoming cotangent (A is symmetric),
    mirroring the reference custom gradient
    (2d/phi/solver/sparse.py:106-112). `guess` warm-starts the forward
    solve (no effect on the solution or its gradient)."""
    if guess is None:
        guess = jnp.zeros_like(div)
    return _pressure_solve_ws(masks, div, guess, accuracy, max_iter)


def divergence_free(
    masks: SmokeMasks, v: jnp.ndarray, accuracy: float = 1e-6,
    max_iter: int = 500, p_guess: Optional[jnp.ndarray] = None,
    return_pressure: bool = False, backend: str = "xla",
):
    """Incompressible projection (reference: FluidSimulation.divergence_free,
    2d/phi/flow.py:317-327): bc -> pressure solve -> subtract masked grad p.
    `p_guess` warm-starts the CG; `return_pressure` also returns p for the
    next frame's warm start. backend="pallas" uses the VMEM-resident
    chunked-CG TPU kernel (ops/pressure_cg.py, ~2x faster on a v5e chip)."""
    v = v * masks.velocity_mask
    if backend in ("pallas", "pallas_v1"):
        from safediffcon_tpu.ops.pressure_cg import pressure_solve_pallas

        p = pressure_solve_pallas(
            masks, divergence(v), accuracy, max_iter, guess=p_guess,
            variant="v1" if backend == "pallas_v1" else "v2")
    else:
        p = pressure_solve(masks, divergence(v), accuracy, max_iter, guess=p_guess)
    v = v - pressure_gradient(p) * masks.velocity_mask
    if return_pressure:
        return v, p
    return v


def at_centers(v: jnp.ndarray) -> jnp.ndarray:
    """Staggered (B, N, N, 2) -> cell-centered (B, CELLS, CELLS, 2) [y, x
    components order (vy, vx)] (reference: at_centers, 2d/phi/math/nd.py:332-342)."""
    vy, vx = v[..., 1], v[..., 0]
    cy = 0.5 * (vy[:, 1:, :-1] + vy[:, :-1, :-1])
    cx = 0.5 * (vx[:, :-1, 1:] + vx[:, :-1, :-1])
    return jnp.stack([cy, cx], axis=-1)


def bilinear_sample(field: jnp.ndarray, coords: jnp.ndarray) -> jnp.ndarray:
    """Bilinear resampling of (B, H, W) at (B, H, W, 2) [y, x] coordinates,
    faithful to the reference's asymmetric boundary quirk
    (2d/phi/math/scipy_backend.py:58-75,181-185): coordinates are clamped
    to [0, dim] (NOT dim-1), and scipy interpn then returns fill_value=0
    for any point beyond dim-1 — i.e. replicate at the LOW edge, zero-fill
    past the HIGH edge."""
    h, w = field.shape[1], field.shape[2]
    cy = jnp.clip(coords[..., 0], 0.0, float(h))
    cx = jnp.clip(coords[..., 1], 0.0, float(w))
    valid = (cy <= h - 1) & (cx <= w - 1)
    cy = jnp.minimum(cy, h - 1.0)
    cx = jnp.minimum(cx, w - 1.0)
    y0 = jnp.floor(cy)
    x0 = jnp.floor(cx)
    wy = cy - y0
    wx = cx - x0
    y0 = y0.astype(jnp.int32)
    x0 = x0.astype(jnp.int32)
    y1 = jnp.minimum(y0 + 1, h - 1)
    x1 = jnp.minimum(x0 + 1, w - 1)

    def gather(yy, xx):
        return jnp.take_along_axis(
            field.reshape(field.shape[0], -1), (yy * w + xx).reshape(field.shape[0], -1), axis=1
        ).reshape(yy.shape)

    f00 = gather(y0, x0)
    f01 = gather(y0, x1)
    f10 = gather(y1, x0)
    f11 = gather(y1, x1)
    out = (
        f00 * (1 - wy) * (1 - wx)
        + f01 * (1 - wy) * wx
        + f10 * wy * (1 - wx)
        + f11 * wy * wx
    )
    return out * valid


def advect_scalar(field: jnp.ndarray, v: jnp.ndarray, dt: float = 1.0) -> jnp.ndarray:
    """Semi-Lagrangian advection of a cell-centered (B, CELLS, CELLS) field
    (reference: _advect_centered_field, 2d/phi/math/nd.py:425-431)."""
    c = at_centers(v)
    ys = jnp.arange(CELLS, dtype=field.dtype)
    idx_y, idx_x = jnp.meshgrid(ys, ys, indexing="ij")
    coords = jnp.stack(
        [idx_y[None] - c[..., 0] * dt, idx_x[None] - c[..., 1] * dt], axis=-1
    )
    return bilinear_sample(field, coords)


# ---------------------------------------------------------------------------
# Control assembly + full rollout (reference: evaluate_solver.py:82-349)
# ---------------------------------------------------------------------------

def assemble_control(
    masks: SmokeMasks, prev_v: jnp.ndarray, control: jnp.ndarray
) -> jnp.ndarray:
    """Write the control field into the border band (interior [16:112]^2
    kept from the previous velocity), matching get_envolve
    (reference: evaluate_solver.py:82-111). control: (B, N, N, 2)."""
    band = jnp.ones((N, N, 1), dtype=prev_v.dtype)
    band = band.at[16:112, 16:112, :].set(0.0)
    return control * band + prev_v * (1.0 - band)


class RolloutRecord(NamedTuple):
    density: jnp.ndarray  # (B, T, CELLS, CELLS) unabsorbed density
    zero_density: jnp.ndarray  # (B, T, CELLS, CELLS) absorbed ("set-zero") field
    velocity: jnp.ndarray  # (B, T, N, N, 2)
    smoke_rate: jnp.ndarray  # (B, T) target-bucket absorption fraction
    smoke_safe_rate: jnp.ndarray  # (B, T) safe-box absorption fraction
    mass: jnp.ndarray  # (B, T) total mass: absorbed-by-buckets + in-domain
    # (the reference's density_field_sum, 2d/apps/a_gen_dataset_128.py:731-737)


def _absorb(density, region_masks, concat, accum):
    """One absorption step: add region sums to accum, zero those cells
    (reference: evaluate_solver.py:268-275,304-311)."""
    sums = jnp.einsum("byx,ryx->br", density, region_masks)
    accum = accum + sums
    density = density * (1.0 - concat)[None]
    return density, accum


def smoke_rollout(
    masks: SmokeMasks,
    init_density: jnp.ndarray,  # (B, CELLS, CELLS)
    init_velocity: jnp.ndarray,  # (B, N, N, 2)
    controls: jnp.ndarray,  # (B, T, N, N, 2) per-frame control fields
    accuracy: float = 1e-6,
    max_iter: int = 500,
    dt: float = 1.0,
    warm_start: bool = True,
    backend: str = "xla",
) -> RolloutRecord:
    """Full T+1-frame rollout as one lax.scan (reference solver(),
    evaluate_solver.py:209-349). Frame 0 records the initial state after
    absorption; frames 1..T evolve with control frames 0..T-1.

    warm_start seeds each frame's CG with the previous frame's pressure —
    the solution is unchanged (same tolerance) but iteration counts drop
    severalfold; disable for exact reference iteration behavior."""
    b = init_density.shape[0]
    n_buckets = masks.bucket_masks.shape[0]
    n_safe = masks.safe_masks.shape[0]

    dens0 = init_density
    zero0, bucket_acc = _absorb(
        dens0, masks.bucket_masks, masks.bucket_concat,
        jnp.zeros((b, n_buckets), dens0.dtype),
    )
    safe0, safe_acc = _absorb(
        dens0, masks.safe_masks, masks.safe_concat,
        jnp.zeros((b, n_safe), dens0.dtype),
    )

    def rates(bucket_acc, safe_acc, zero_d, safe_d):
        mass = bucket_acc.sum(-1) + zero_d.sum((-1, -2))
        smoke = bucket_acc[:, TARGET_BUCKET] / mass
        safe = safe_acc[:, 0] / (safe_acc.sum(-1) + safe_d.sum((-1, -2)))
        return smoke, safe, mass

    smoke0, srate0, mass0 = rates(bucket_acc, safe_acc, zero0, safe0)

    def body(carry, control):
        dens, zero_d, safe_d, vel, b_acc, s_acc, p_prev = carry
        vel = assemble_control(masks, vel, control)
        vel, p_prev = divergence_free(
            masks, vel, accuracy, max_iter,
            p_guess=p_prev if warm_start else None, return_pressure=True,
            backend=backend,
        )
        vel = vel * masks.velocity_mask

        dens = advect_scalar(dens, vel, dt)
        zero_d = advect_scalar(zero_d, vel, dt)
        safe_d = advect_scalar(safe_d, vel, dt)

        zero_d, b_acc = _absorb(zero_d, masks.bucket_masks, masks.bucket_concat, b_acc)
        safe_d, s_acc = _absorb(safe_d, masks.safe_masks, masks.safe_concat, s_acc)
        smoke, safe, mass = rates(b_acc, s_acc, zero_d, safe_d)
        out = (dens, zero_d, vel, smoke, safe, mass)
        return (dens, zero_d, safe_d, vel, b_acc, s_acc, p_prev), out

    p0 = jnp.zeros((b, CELLS, CELLS), dens0.dtype)
    carry0 = (dens0, zero0, safe0, init_velocity, bucket_acc, safe_acc, p0)
    controls_t = jnp.moveaxis(controls, 1, 0)  # (T, B, ...)
    _, (ds, zs, vs, sm, sf, ms) = jax.lax.scan(body, carry0, controls_t)

    density = jnp.concatenate([dens0[:, None], jnp.moveaxis(ds, 0, 1)], axis=1)
    zero_density = jnp.concatenate([zero0[:, None], jnp.moveaxis(zs, 0, 1)], axis=1)
    velocity = jnp.concatenate(
        [init_velocity[:, None], jnp.moveaxis(vs, 0, 1)], axis=1
    )
    smoke_rate = jnp.concatenate([smoke0[:, None], jnp.moveaxis(sm, 0, 1)], axis=1)
    safe_rate = jnp.concatenate([srate0[:, None], jnp.moveaxis(sf, 0, 1)], axis=1)
    mass = jnp.concatenate([mass0[:, None], jnp.moveaxis(ms, 0, 1)], axis=1)
    return RolloutRecord(density, zero_density, velocity, smoke_rate, safe_rate,
                         mass)


def upsample_control(c: jnp.ndarray, time_scale: int, space_scale: int) -> jnp.ndarray:
    """(B, nt, nx, nx[, C]) low-res control -> (B, nt*ts, 128, 128[, C])
    nearest-neighbor tiling (reference: evaluate_solver.py:228-232)."""
    c = jnp.repeat(c, time_scale, axis=1)
    c = jnp.repeat(c, space_scale, axis=2)
    c = jnp.repeat(c, space_scale, axis=3)
    return c


def evaluate_control(
    masks: SmokeMasks,
    init_density_64: jnp.ndarray,  # (B, 64, 64)
    c1_32: jnp.ndarray,  # (B, nt, 64, 64) x-control at record resolution
    c2_32: jnp.ndarray,  # (B, nt, 64, 64) y-control
    accuracy: float = 1e-8,  # reference eval tolerance (evaluate_solver.py:108)
    max_iter: int = 500,
    time_scale: int = 8,
    space_scale: int = 2,
    backend: str = "xla",
) -> Tuple[jnp.ndarray, jnp.ndarray, RolloutRecord]:
    """The reference evaluation entry: upsample (nt, nx, nx) controls to
    (nt*time_scale, 128, 128), roll out, return per-record-frame
    (smoke_rate, smoke_safe_rate) downsampled back to nt frames plus the
    full record (reference: evaluate_solver.py:209-349, per_evaluate in
    2d/inference_2d.py:389-405). The reference config is nt=32,
    time_scale=8, space_scale=2 (64^2 records) -> 256 simulation frames;
    space_scale=1 runs the scaled native-128^2 configuration."""
    b = init_density_64.shape[0]
    dens128 = jnp.repeat(
        jnp.repeat(init_density_64, space_scale, axis=1), space_scale, axis=2
    )
    init_density = dens128[:, :CELLS, :CELLS]

    c = jnp.stack([c1_32, c2_32], axis=-1)  # (B, nt, nx, nx, 2)
    controls = upsample_control(c, time_scale, space_scale)
    controls = controls[:, :-1]  # frames 0..T-2 drive steps 1..T-1
    # interior is zeroed by assemble_control's band

    init_velocity = jnp.zeros((b, N, N, 2), init_density.dtype).at[..., 1].set(0.8)

    rec = smoke_rollout(masks, init_density, init_velocity, controls, accuracy,
                        max_iter, backend=backend)
    smoke32 = rec.smoke_rate[:, ::time_scale]
    safe32 = rec.smoke_safe_rate[:, ::time_scale]
    return smoke32, safe32, rec
