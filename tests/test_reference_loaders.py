"""Loaders for the reference's on-disk data formats, tested against tiny
synthetic fixtures written in exactly the reference layout.

Formats covered (VERDICT round 1, Missing #2):
- Burgers HDF5: burgers_{split}.h5 group {split} with pde_11-128[, _f]
  (reference: 1D/data/load_hdf5.py:6-57)
- Smoke per-sim npy dirs: sim_%06d/{Density,Velocity,Control,Smoke,
  Smoke_safe}.npy (reference: 2d/ddpm/data_2d.py:43-113)
- Tokamak HF dataset on disk (reference: tokamak/data/tokamak_dataset.py:5-56)
"""
import numpy as np
import pytest

from safediffcon_tpu.tasks.burgers.data import (
    BurgersDataset,
    stack_and_pad as burgers_stack,
)
from safediffcon_tpu.tasks.smoke.data import SmokeDataset
from safediffcon_tpu.tasks.smoke.task import RESCALER
from safediffcon_tpu.tasks.tokamak.data import (
    TokamakDataset,
    stack_and_pad as tokamak_stack,
)


def test_burgers_load_h5(tmp_path):
    h5py = pytest.importorskip("h5py")
    rng = np.random.default_rng(0)
    u = rng.normal(size=(5, 11, 128))
    f = rng.normal(size=(5, 10, 128))
    path = tmp_path / "burgers_train.h5"
    with h5py.File(path, "w") as h5:
        grp = h5.create_group("train")
        # the reference writes float64 (generate_burgers.py:543 dtype=float)
        grp.create_dataset("pde_11-128", data=u, dtype=float)
        grp.create_dataset("pde_11-128_f", data=f, dtype=float)

    ds = BurgersDataset.load_h5(str(path), "train")
    assert ds.data.shape == (5, 16, 128, 3)
    np.testing.assert_allclose(ds.u_phys, u.astype(np.float32), rtol=1e-6)
    np.testing.assert_allclose(ds.f_phys, f.astype(np.float32), rtol=1e-6)
    expect = burgers_stack(u.astype(np.float32), f.astype(np.float32))
    np.testing.assert_allclose(ds.data, expect, rtol=1e-6)

    sub = BurgersDataset.load_h5(str(path), "train", subset=2)
    assert len(sub) == 2
    np.testing.assert_allclose(sub.data, ds.data[:2])


def _write_reference_sim(base, sim_id, rng, nt=33, size=8):
    sim = base / f"sim_{sim_id:06d}"
    sim.mkdir(parents=True)
    d = rng.normal(size=(size, size, 1, nt)).astype(np.float32)
    v = rng.normal(size=(size, size, 2, nt)).astype(np.float32)
    c = rng.normal(size=(size, size, 2, nt)).astype(np.float32)
    smoke = rng.uniform(0.1, 1.0, size=(nt, 8)).astype(np.float32)
    safe = rng.uniform(0.1, 1.0, size=(nt, 9)).astype(np.float32)
    np.save(sim / "Density.npy", d)
    np.save(sim / "Velocity.npy", v)
    np.save(sim / "Control.npy", c)
    np.save(sim / "Smoke.npy", smoke)
    np.save(sim / "Smoke_safe.npy", safe)
    return d, v, c, smoke, safe


def test_smoke_load_sim_dirs(tmp_path):
    rng = np.random.default_rng(1)
    train_dir = tmp_path / "train"
    fixtures = {i: _write_reference_sim(train_dir, i, rng) for i in range(6)}
    _write_reference_sim(tmp_path / "test", 20000, rng)

    frames, size = 32, 8
    train = SmokeDataset.load_sim_dirs(str(tmp_path), "train", n_cal=2,
                                       frames=frames)
    cal = SmokeDataset.load_sim_dirs(str(tmp_path), "cal", n_cal=2,
                                     frames=frames)
    test = SmokeDataset.load_sim_dirs(str(tmp_path), "test", frames=frames)
    assert len(train) == 4 and len(cal) == 2 and len(test) == 1
    assert train.raw.shape == (4, frames, size, size, 7)

    # cal = LAST n_cal sims of the train dir (reference id convention:
    # 2d/ddpm/data_2d.py:47 sim_id + 20000 - n_simu)
    d, v, c, smoke, safe = fixtures[4]
    rec = cal.raw[0]
    fields = np.concatenate([d, v, c], axis=2).transpose(3, 0, 1, 2)[:frames]
    np.testing.assert_allclose(rec[..., :5], fields, rtol=1e-6)
    s = smoke[:frames, 1] / smoke[:frames].sum(-1)
    sf = safe[:frames, 0] / safe[:frames].sum(-1)
    np.testing.assert_allclose(rec[..., 5], s[:, None, None] *
                               np.ones((1, size, size)), rtol=1e-5)
    np.testing.assert_allclose(rec[..., 6], sf[:, None, None] *
                               np.ones((1, size, size)), rtol=1e-5)
    np.testing.assert_allclose(cal.data, cal.raw / RESCALER, rtol=1e-6)


def test_tokamak_load_hf(tmp_path):
    datasets = pytest.importorskip("datasets")
    rng = np.random.default_rng(2)
    n = 8
    outputs = rng.normal(size=(n, 122, 8)).astype(np.float32)
    actions = rng.normal(size=(n, 121, 9)).astype(np.float32)
    ds = datasets.Dataset.from_dict(
        {"outputs": [o for o in outputs], "actions": [a for a in actions]}
    )
    path = tmp_path / "tokamak_dataset"
    ds.save_to_disk(str(path))

    train = TokamakDataset.load_hf(str(path), "train", n_train=5, n_cal=2,
                                   n_test=1)
    cal = TokamakDataset.load_hf(str(path), "cal", n_train=5, n_cal=2,
                                 n_test=1)
    test = TokamakDataset.load_hf(str(path), "test", n_train=5, n_cal=2,
                                  n_test=1)
    assert len(train) == 5 and len(cal) == 2 and len(test) == 1

    states = outputs[:, :, [1, 4, 6]]
    np.testing.assert_allclose(train.state_phys, states[:5], rtol=1e-6)
    np.testing.assert_allclose(cal.state_phys, states[5:7], rtol=1e-6)
    expect = tokamak_stack(states[5:7], actions[5:7])
    np.testing.assert_allclose(cal.data, expect, rtol=1e-6)

    sub = TokamakDataset.load_hf(str(path), "train", n_train=5, n_cal=2,
                                 n_test=1, subset=3)
    assert len(sub) == 3


def test_tokamak_consolidate_then_load_hf(tmp_path):
    """Reference data-prep flow: per-seed {i}.npz rollout dicts ->
    consolidated HF dataset (tokamak/data/consolidate_dataset.py:10-58) ->
    load_hf. Round-trips values exactly."""
    pytest.importorskip("datasets")
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))
    from consolidate_tokamak import consolidate_dataset

    rng = np.random.default_rng(3)
    n = 6
    seed_dir = tmp_path / "seeds"
    seed_dir.mkdir()
    outputs = rng.normal(size=(n, 122, 8)).astype(np.float32)
    actions = rng.normal(size=(n, 121, 9)).astype(np.float32)
    for i in range(n):
        np.savez(
            seed_dir / f"{i}.npz",
            data={
                "inputs": rng.normal(size=(122, 18)).astype(np.float32),
                "outputs": outputs[i],
                "actions": actions[i],
                "targets": rng.normal(size=(3,)).astype(np.float32),
            },
        )

    ds = consolidate_dataset(str(seed_dir), 0, n)
    out = tmp_path / "consolidated_dataset"
    ds.save_to_disk(str(out))

    train = TokamakDataset.load_hf(str(out), "train", n_train=4, n_cal=1,
                                   n_test=1)
    assert len(train) == 4
    states = outputs[:, :, [1, 4, 6]]
    np.testing.assert_allclose(train.state_phys, states[:4], rtol=1e-6)
