"""Smoke solver parity tests against PhiFlow-generated goldens.

Golden data (tests/golden/smoke_reference.npz) was produced by running the
reference's vendored PhiFlow numpy backend (float64, CG accuracy 1e-10)
through the exact evaluate_solver.py stepping: masks, one projection, one
advection, and a 16-step maze rollout with band controls + bucket
accounting (reference: 2d/apps/evaluate_solver.py:209-349).
"""
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from safediffcon_tpu.solvers import smoke as S

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "smoke_reference.npz")


@pytest.fixture(scope="module")
def golden():
    return np.load(GOLDEN)


@pytest.fixture(scope="module")
def masks():
    return S.build_masks()


def test_masks_match_phiflow(golden, masks):
    assert np.array_equal(np.asarray(S.fluid_mask()), golden["fluid_mask"])
    assert np.array_equal(np.asarray(masks.velocity_mask), golden["velocity_mask"])


def test_projection_parity(golden, masks):
    out = S.divergence_free(masks, jnp.asarray(golden["proj_in"]), accuracy=1e-6)
    out = out * masks.velocity_mask
    assert np.abs(np.asarray(out) - golden["proj_out"]).max() < 5e-5


def test_projection_kills_divergence(golden, masks):
    """Divergence vanishes in INTERIOR fluid cells (away from obstacles and
    the domain edge). The final bc mask re-introduces divergence in cells
    adjacent to walls — the reference behaves identically (its own post-bc
    max |div| there is 1.935), so those cells are excluded."""
    out = S.divergence_free(masks, jnp.asarray(golden["proj_in"]), accuracy=1e-7)
    div = S.divergence(out * masks.velocity_mask)
    fm = np.asarray(S.fluid_mask())
    interior = np.zeros_like(fm)
    interior[1:-1, 1:-1] = (
        fm[1:-1, 1:-1] * fm[2:, 1:-1] * fm[:-2, 1:-1] * fm[1:-1, 2:] * fm[1:-1, :-2]
    )
    assert float(jnp.abs(div * interior).max()) < 1e-4


def test_advection_parity(golden):
    adv = S.advect_scalar(jnp.asarray(golden["adv_in"])[None], jnp.asarray(golden["proj_out"]))
    assert np.abs(np.asarray(adv[0]) - golden["adv_out"]).max() < 5e-5


def test_rollout_parity(golden, masks):
    rec = S.smoke_rollout(
        masks,
        jnp.asarray(golden["roll_dens0"])[None],
        jnp.zeros((1, S.N, S.N, 2)).at[..., 1].set(0.8),
        jnp.asarray(golden["roll_controls"])[None],
        accuracy=1e-6,
    )
    assert np.abs(np.asarray(rec.density[0, -1]) - golden["roll_density_final"]).max() < 2e-4
    assert np.abs(np.asarray(rec.velocity[0, -1]) - golden["roll_vel_final"]).max() < 5e-5
    assert np.abs(np.asarray(rec.smoke_rate[0]) - golden["roll_rates"]).max() < 1e-6
    # mass conservation (advection loses a little at open boundaries, same
    # as the reference: ref keeps 99.96 of 100)
    np.testing.assert_allclose(
        float(rec.density[0, -1].sum()), golden["roll_density_final"].sum(), rtol=1e-5
    )


def test_bucket_absorption_accounting(masks):
    """Density placed inside the safe box is absorbed at frame 0 and the
    safe rate equals absorbed/(absorbed + remaining)."""
    y, x, dy, dx = S.SAFE_BOX
    dens = jnp.zeros((1, S.CELLS, S.CELLS))
    dens = dens.at[:, y : y + 4, x : x + 4].set(1.0)  # 16 units inside safe box
    dens = dens.at[:, 20:22, 60:62].set(1.0)  # 4 units outside
    rec = S.smoke_rollout(
        masks, dens, jnp.zeros((1, S.N, S.N, 2)),
        jnp.zeros((1, 1, S.N, S.N, 2)), accuracy=1e-6,
    )
    np.testing.assert_allclose(float(rec.smoke_safe_rate[0, 0]), 16.0 / 20.0, atol=1e-6)
    assert float(rec.smoke_rate[0, 0]) == 0.0


def test_pressure_solve_gradient(masks):
    """custom_vjp backward = CG on the cotangent (A symmetric): the adjoint
    identity A @ grad == w must hold wherever A is nonsingular-acting (fp32
    finite differences cancel too much on this large linear functional to
    be a usable oracle)."""
    rng = np.random.default_rng(0)
    div = jnp.asarray(rng.normal(size=(1, S.CELLS, S.CELLS)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(1, S.CELLS, S.CELLS)).astype(np.float32))

    def loss(d):
        return (S.pressure_solve(masks, d, 1e-7, 2000) * w).sum()

    g = jax.grad(loss)(div)
    recovered = S._apply_A(masks, g)
    err = np.abs(np.asarray(recovered) - np.asarray(w))
    assert err.max() < 1e-3, f"adjoint identity violated: {err.max()}"


def test_control_upsampling_shapes(masks):
    b = 2
    smoke32, safe32, rec = S.evaluate_control(
        masks,
        jnp.zeros((b, 64, 64)).at[:, 10:15, 30:35].set(1.0),
        jnp.zeros((b, 32, 64, 64)),
        jnp.zeros((b, 32, 64, 64)),
        accuracy=1e-4,
        max_iter=100,
    )
    assert smoke32.shape == (b, 32)
    assert safe32.shape == (b, 32)
    assert rec.density.shape == (b, 256, S.CELLS, S.CELLS)
    assert bool(jnp.isfinite(smoke32).all())


def test_rollout_mass_field(masks):
    """RolloutRecord.mass tracks absorbed+in-domain total mass — the
    reference's density_field_sum (2d/apps/a_gen_dataset_128.py:731-737)."""
    dens = jnp.zeros((1, S.CELLS, S.CELLS)).at[:, 60:70, 20:30].set(1.0)
    v0 = jnp.zeros((1, S.N, S.N, 2)).at[..., 1].set(0.8)
    rec = S.smoke_rollout(
        masks, dens, v0, jnp.zeros((1, 8, S.N, S.N, 2)), accuracy=1e-4,
        max_iter=80,
    )
    assert rec.mass.shape == (1, 9)
    np.testing.assert_allclose(float(rec.mass[0, 0]), 100.0, rtol=1e-5)
    # semi-Lagrangian advection in the closed maze conserves mass to ~1%
    ratio = float(rec.mass[0, -1] / rec.mass[0, 0])
    assert 0.9 < ratio <= 1.01


def test_generate_dataset_conservation_filter(tmp_path):
    """The generator's conservation_min/max filter (reference min/max_sum_rate,
    a_gen_dataset_128.py:733-741): loose bounds keep everything; an
    impossible lower bound rejects every sim and errors out instead of
    looping forever."""
    from safediffcon_tpu.tasks.smoke.data import SmokeDataset, generate_smoke_dataset

    path = str(tmp_path / "smoke.npz")
    generate_smoke_dataset(
        path, n_train=2, n_cal=1, n_test=1, n_frames=8, record_frames=4,
        space_scale=4, gen_batch=4, accuracy=1e-3, max_iter=40,
        conservation_min=0.2, conservation_max=2.0,
    )
    assert len(SmokeDataset.load(path, "train").data) == 2

    # conservation_max=0 rejects every sim (mass ratio is non-negative):
    # the generator must error out instead of regenerating forever
    with pytest.raises(RuntimeError, match="conservation filter"):
        generate_smoke_dataset(
            str(tmp_path / "reject.npz"), n_train=2, n_cal=0, n_test=0,
            n_frames=8, record_frames=4, space_scale=4, gen_batch=2,
            accuracy=1e-3, max_iter=40, conservation_max=0.0,
        )
