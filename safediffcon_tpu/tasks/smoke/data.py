"""2D smoke dataset: generation (JAX solver) and in-memory splits.

The reference generates data by simulating random smoke blobs steered by a
4-phase waypoint velocity program through the maze, one scipy-CG process
at a time, writing per-sim npy dirs (reference:
2d/apps/a_gen_dataset_128.py:100-345,491-744). Here the whole batch of
rollouts runs vmapped on device and the record is written as one npz per
split. Splits follow the reference: train 19800 / cal 200 / test 50
(2d/ddpm/data_2d.py:31-37) — but sizes are configurable since full-scale
generation is hours of solver time.

Record format per sample (reference: 2d/ddpm/data_2d.py:43-113): 32 frames
of (64, 64) density/velocity/control (every 8th 128^2 frame, 2x spatial
downsample) + scalar smoke/safe absorption fractions tiled over space ->
(32, 64, 64, 7) channels-last.
"""
from __future__ import annotations

import dataclasses
import os
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from safediffcon_tpu.solvers import smoke as S
from safediffcon_tpu.tasks.smoke.task import FRAMES, RESCALER, SIZE


def _waypoints(rng: np.random.Generator):
    """Random start + waypoint x-positions (reference: exp2_target_128,
    2d/apps/a_gen_dataset_128.py:179-211)."""
    m = 4
    start_x = 2 * round(rng.integers(16 + 2 + m, 112 - 10 - m) / 2)
    start_y = 2 * round(rng.integers(16 + 2 + m, 40 - 10 - m) / 2)
    a = 0 if start_x < 64 - 8 else 1
    t1 = rng.integers(16 + m, 64 - 8) if a == 0 else rng.integers(64, 112 - 8 - m)
    t2 = rng.integers(16 + m, 64 - 8) if a == 0 else rng.integers(64, 112 - 8 - m)
    t3 = rng.integers(50, 80 - 1 - 8)
    end_x = rng.integers(64 - 8, 64 + 8 - 8)
    xs = [int(start_x), int(t1), int(t2), int(t3), int(end_x)]
    ys = [int(start_y), 40, 50, 64, 112]
    return xs, ys


def _velocity_program(
    rng: np.random.Generator,
    xs,
    ys,
    n_frames: int,
    y_scale: float = 1.0,
    min_scale: float = 2.0,
    max_scale: float = 5.0,
):
    """Per-frame (vx, vy) targets from the waypoint path
    (reference: get_per_vel, 2d/apps/a_gen_dataset_128.py:130-176)."""
    seg = [
        np.hypot(xs[i + 1] - xs[i], ys[i + 1] - ys[i]) for i in range(4)
    ]
    total = sum(seg)
    v = total / float(n_frames)
    scale = rng.uniform(min_scale, max_scale)
    vxs = [scale * v * (xs[i + 1] - xs[i]) / seg[i] for i in range(4)]
    vys = [y_scale * v * (ys[i + 1] - ys[i]) / seg[i] for i in range(4)]
    iv = [int(n_frames * seg[i] / total) for i in range(3)]
    bounds = np.cumsum([iv[0] + 1, iv[1], iv[2]])
    phase = np.searchsorted(bounds, np.arange(n_frames), side="right")
    return np.asarray(vxs)[phase], np.asarray(vys)[phase]  # (n_frames,) each


def generate_smoke_dataset(
    path: str,
    n_train: int = 512,
    n_cal: int = 200,
    n_test: int = 50,
    seed: int = 0,
    n_frames: int = 256,
    record_frames: int = FRAMES,
    space_scale: int = 2,
    gen_batch: int = 16,
    accuracy: float = 1e-6,
    max_iter: int = 500,
    backend: str = "auto",
    conservation_min: Optional[float] = None,
    conservation_max: Optional[float] = None,
) -> None:
    """Generate all splits with the vmapped JAX rollout and save one npz.

    Controls are full-field N(vx, |vx|/10) noise recorded every
    time_scale frames at 64^2 with the interior zeroed (reference:
    get_envolve, 2d/apps/a_gen_dataset_128.py:287-313).

    conservation_min/max, when set, reject sims whose final total mass
    (bucket-absorbed + in-domain, as a fraction of the initial blob mass)
    falls outside [conservation_min, conservation_max] — the reference
    dataset writer's density-sum quality filter (min_sum_rate/max_sum_rate,
    reference: 2d/apps/a_gen_dataset_128.py:731-741). Rejected sims are
    regenerated until each split is full."""
    masks = S.build_masks()
    time_scale = max(n_frames // record_frames, 1)
    n_rec = n_frames // time_scale
    size = S.N // space_scale
    lo, hi = 16 // space_scale, 112 // space_scale
    rng = np.random.default_rng(seed)
    total = n_train + n_cal + n_test

    if backend == "auto":
        backend = "pallas" if jax.default_backend() == "tpu" else "xla"

    @jax.jit
    def gen_batch_fn(dens0, v0, vxs, vys, key):
        """Noise synthesis + rollout + record subsampling, all on device.

        The full-field control noise ((b, T-1, 128, 128, 2) ~ 33 MB/sim)
        and the un-subsampled rollout record never cross the host-device
        boundary — on a tunneled TPU that transfer dominates generation
        time otherwise."""
        b_ = dens0.shape[0]
        noise = jax.random.normal(
            key, (b_, n_frames - 1, S.N, S.N, 2), jnp.float32)
        ctrl = jnp.stack(
            [
                vxs[:, :-1, None, None] * (1 + 0.1 * noise[..., 0]),
                vys[:, :-1, None, None] * (1 + 0.1 * noise[..., 1]),
            ],
            axis=-1,
        )
        rec = S.smoke_rollout(masks, dens0, v0, ctrl, accuracy, max_iter,
                              backend=backend)
        ctrl_full = jnp.concatenate(
            [jnp.zeros((b_, 1, S.N, S.N, 2), ctrl.dtype), ctrl], axis=1)
        return (
            rec.density[:, ::time_scale, ::space_scale, ::space_scale],
            rec.velocity[:, ::time_scale, ::space_scale, ::space_scale],
            ctrl_full[:, ::time_scale, ::space_scale, ::space_scale],
            rec.smoke_rate[:, ::time_scale],
            rec.smoke_safe_rate[:, ::time_scale],
            rec.mass[:, -1] / rec.mass[:, 0],
        )

    import logging
    import time as _time

    _log = logging.getLogger(__name__)
    _t0 = _time.time()
    key = jax.random.PRNGKey(seed)
    recs = []
    done = 0
    attempted = 0
    while done < total:
        if attempted >= 20 * total + gen_batch:
            raise RuntimeError(
                f"smoke datagen: conservation filter [{conservation_min}, "
                f"{conservation_max}] rejected nearly all of {attempted} "
                f"generated sims ({done}/{total} kept) — bounds too tight")
        b = min(gen_batch, total - done)
        attempted += b
        dens0 = np.zeros((b, S.CELLS, S.CELLS), np.float32)
        vxs = np.zeros((b, n_frames), np.float32)
        vys = np.zeros((b, n_frames), np.float32)
        for i in range(b):
            xs, ys = _waypoints(rng)
            dens0[i, ys[0] : ys[0] + 10, xs[0] : xs[0] + 10] = 1.0
            vxs[i], vys[i] = _velocity_program(rng, xs, ys, n_frames)

        v0 = np.zeros((b, S.N, S.N, 2), np.float32)
        v0[..., 1] = 0.8
        key, sub = jax.random.split(key)
        d_rec, v_rec, c_rec, s_rec, sf_rec, mass_ratio = gen_batch_fn(
            jnp.asarray(dens0), jnp.asarray(v0), jnp.asarray(vxs),
            jnp.asarray(vys), sub)

        # assemble the (b, n_rec, size, size, 7) record on host (tiny now)
        dens = np.zeros((b, n_rec, size, size), np.float32)
        dsub = np.asarray(d_rec)
        dens[:, :, : dsub.shape[2], : dsub.shape[3]] = dsub
        vel = np.asarray(v_rec)
        ctrl = np.array(c_rec)  # writable copy (np.asarray of a jax array is read-only)
        # zero interior of recorded control (indirect control band)
        ctrl[:, :, lo:hi, lo:hi, :] = 0.0
        smoke = np.asarray(s_rec)
        safe = np.asarray(sf_rec)

        out = np.zeros((b, n_rec, size, size, 7), np.float32)
        out[..., 0] = dens
        out[..., 1] = vel[..., 0]
        out[..., 2] = vel[..., 1]
        out[..., 3] = ctrl[..., 0]
        out[..., 4] = ctrl[..., 1]
        out[..., 5] = smoke[:, :, None, None]
        out[..., 6] = safe[:, :, None, None]
        if conservation_min is not None or conservation_max is not None:
            mr = np.asarray(mass_ratio)
            keep = np.ones(b, bool)
            if conservation_min is not None:
                keep &= mr > conservation_min
            if conservation_max is not None:
                keep &= mr < conservation_max
            if not keep.all():
                _log.info("smoke datagen: rejected %d/%d sims "
                          "(mass ratio outside [%s, %s])", int((~keep).sum()),
                          b, conservation_min, conservation_max)
            out = out[keep]
            b = int(keep.sum())
        recs.append(out)
        done += b
        _log.info("smoke datagen %d/%d sims (%.2f s/sim)", done, total,
                  (_time.time() - _t0) / max(done, 1))

    data = np.concatenate(recs)
    splits = {
        "train": data[:n_train],
        "cal": data[n_train : n_train + n_cal],
        "test": data[n_train + n_cal :],
    }
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    np.savez_compressed(path, **{f"{k}_data": v for k, v in splits.items()})


def _read_reference_sim(base: str, sim_id: int, frames: int = FRAMES) -> np.ndarray:
    """One reference sim dir -> (frames, 64, 64, 7) physical-unit record.

    Field npys are (H, W, C, T+1); scalar absorption fractions are bucket 1
    of Smoke.npy and region 0 of Smoke_safe.npy, each normalized by the
    row sum and tiled over space (reference: 2d/ddpm/data_2d.py:48-62).
    """
    sim = os.path.join(base, f"sim_{sim_id:06d}")
    d = np.load(os.path.join(sim, "Density.npy")).astype(np.float32)
    v = np.load(os.path.join(sim, "Velocity.npy")).astype(np.float32)
    c = np.load(os.path.join(sim, "Control.npy")).astype(np.float32)
    s_ori = np.load(os.path.join(sim, "Smoke.npy")).astype(np.float32)
    s_safe = np.load(os.path.join(sim, "Smoke_safe.npy")).astype(np.float32)

    # (H, W, 5, T+1) -> (frames, H, W, 5), channel order d,vx,vy,cx,cy
    fields = np.concatenate([d, v, c], axis=2).transpose(3, 0, 1, 2)[:frames]
    s = (s_ori[:, 1] / s_ori.sum(-1))[:frames]
    sf = (s_safe[:, 0] / s_safe.sum(-1))[:frames]
    h, w = fields.shape[1:3]
    tiled = np.broadcast_to(
        np.stack([s, sf], axis=-1)[:, None, None, :], (frames, h, w, 2)
    )
    return np.concatenate([fields, tiled], axis=-1)


@dataclasses.dataclass
class SmokeDataset:
    """In-memory split: data (N, F, 64, 64, 7).

    `data` is normalized (/RESCALER); `raw` is physical units (the test
    split of the reference is consumed unscaled, 2d/ddpm/data_2d.py:92-113).
    """

    data: np.ndarray
    raw: np.ndarray

    @classmethod
    def load(cls, path: str, split: str, subset: Optional[int] = None) -> "SmokeDataset":
        with np.load(path) as z:
            raw = z[f"{split}_data"]
        if subset is not None:
            raw = raw[:subset]
        return cls(data=(raw / RESCALER).astype(np.float32, copy=False), raw=raw)

    @classmethod
    def load_sim_dirs(
        cls,
        root: str,
        split: str,
        n_cal: int = 200,
        subset: Optional[int] = None,
        frames: int = FRAMES,
    ) -> "SmokeDataset":
        """Read the reference's per-simulation npy-dir layout.

        Layout (reference: 2d/ddpm/data_2d.py:43-113): `{root}/{train,test}/
        sim_%06d/{Density,Velocity,Control}.npy` as (64, 64, C, 33) field
        stacks plus `Smoke.npy` (33, n_buckets) / `Smoke_safe.npy`
        (33, n_regions) absorption tallies. The reference's splits are the
        first 19800 train-dir sims (train), the last 200 train-dir sims
        (cal, ids 19800-19999), and the test dir (ids 20000+); here the
        train/cal boundary is `n_cal` sims from the end of whatever the
        train dir holds, which reproduces the reference exactly at full
        scale and still works on smaller mirrors.
        """
        dirname = "test" if split == "test" else "train"
        base = os.path.join(root, dirname)
        ids = sorted(
            int(name[4:]) for name in os.listdir(base)
            if name.startswith("sim_")
            and os.path.isdir(os.path.join(base, name))
        )
        if split == "train":
            if len(ids) <= n_cal:
                raise ValueError(
                    f"train dir {base} holds {len(ids)} sims but the last "
                    f"n_cal={n_cal} are the calibration split — train and cal "
                    f"must stay disjoint (reference: 2d/ddpm/data_2d.py:31-37)"
                )
            ids = ids[:-n_cal]
        elif split == "cal":
            ids = ids[-n_cal:]
        if subset is not None:
            ids = ids[:subset]
        raw = np.stack(
            [_read_reference_sim(base, sim_id, frames) for sim_id in ids]
        )
        return cls(data=(raw / RESCALER).astype(np.float32, copy=False), raw=raw)

    def __len__(self) -> int:
        return self.data.shape[0]
