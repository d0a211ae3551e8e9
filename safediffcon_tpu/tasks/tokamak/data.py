"""Tokamak dataset: closed-loop generation (JAX solver + RL policy) and
in-memory splits.

The reference consumes a 50k-trajectory HF dataset generated offline by a
ThreadPool of per-seed subprocesses driving the Keras solver
(reference: tokamak/kstar_data_generator_random_target.py,
tokamak/data_parallel_generate.py:17-33). Here the whole closed loop
(RL policy + surrogate step) is one vmapped lax.scan — thousands of
trajectories per second on a TPU chip.

Split sizes follow the reference: train 48950 / cal 1000 / test 50
(tokamak/data/tokamak_dataset.py:11-16).
"""
from __future__ import annotations

import dataclasses
import os
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from safediffcon_tpu.solvers.kstar import closed_loop_batch, load_kstar_params
from safediffcon_tpu.tasks.tokamak.task import NT, N_ACTIONS, N_STATES, PAD_SIZE, SCALER


def generate_tokamak_dataset(
    path: str,
    n_train: int = 48950,
    n_cal: int = 1000,
    n_test: int = 50,
    seed: int = 0,
    gen_batch: int = 512,
) -> None:
    """Generate all splits with the closed-loop JAX rollout and save npz.

    Stores physical-unit states (N, NT, 3) = (βp, q95, li) and actions
    (N, NT-1, 9), matching what the reference extracts from its recorded
    npz files (outputs[:, [1, 4, 6]], tokamak/data/tokamak_dataset.py:36).
    """
    params = load_kstar_params()
    total = n_train + n_cal + n_test
    rng = jax.random.PRNGKey(seed)

    gen = jax.jit(lambda k, n=gen_batch: closed_loop_batch(params, k, n))
    states, actions = [], []
    done = 0
    while done < total:
        n = min(gen_batch, total - done)
        rng, key = jax.random.split(rng)
        outs, acts, _ = gen(key) if n == gen_batch else closed_loop_batch(params, key, n)
        outs = np.asarray(outs[:n])
        states.append(outs[:, :, [1, 4, 6]].astype(np.float32))
        actions.append(np.asarray(acts[:n]).astype(np.float32))
        done += n

    states = np.concatenate(states)
    actions = np.concatenate(actions)
    splits = {
        "train": slice(0, n_train),
        "cal": slice(n_train, n_train + n_cal),
        "test": slice(n_train + n_cal, total),
    }
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    np.savez_compressed(
        path,
        **{
            f"{k}_{name}": arr[sl]
            for k, sl in splits.items()
            for name, arr in (("states", states), ("actions", actions))
        },
    )


def stack_and_pad(states: np.ndarray, actions: np.ndarray, normalize=True) -> np.ndarray:
    """(states (N, NT, 3), actions (N, NT-1, 9)) -> (N, PAD_SIZE, 12)
    channels-last, zero padded, /SCALER (reference:
    tokamak/data/tokamak_dataset.py:34-47)."""
    n = states.shape[0]
    out = np.zeros((n, PAD_SIZE, N_STATES + N_ACTIONS), dtype=np.float32)
    out[:, :NT, :N_STATES] = states
    out[:, : NT - 1, N_STATES:] = actions
    if normalize:
        out /= SCALER
    return out


@dataclasses.dataclass
class TokamakDataset:
    """In-memory split: normalized tensors + physical-unit state targets.

    data: (N, 128, 12) normalized; state_phys: (N, 122, 3) physical units
    (the guidance/eval targets, reference: tokamak/utils/common.py:68-97 —
    the target IS the recorded trajectory of the same sample).
    """

    data: np.ndarray
    state_phys: np.ndarray

    @classmethod
    def load(cls, path: str, split: str, subset: Optional[int] = None) -> "TokamakDataset":
        with np.load(path) as z:
            states = z[f"{split}_states"]
            actions = z[f"{split}_actions"]
        if subset is not None:
            states, actions = states[:subset], actions[:subset]
        return cls(
            data=stack_and_pad(states, actions),
            state_phys=states.astype(np.float32),
        )

    @classmethod
    def load_hf(
        cls,
        path: str,
        split: str,
        n_train: int = 48950,
        n_cal: int = 1000,
        n_test: int = 50,
        subset: Optional[int] = None,
    ) -> "TokamakDataset":
        """Read the reference's HuggingFace-datasets on-disk layout.

        Rows carry `outputs` (122, 8) solver outputs and `actions` (121, 9);
        states are output columns [1, 4, 6] = (βp, q95, li). Splits are
        contiguous index ranges: train [0, 48950), cal [48950, 49950),
        test [49950, 50000) (reference: tokamak/data/tokamak_dataset.py:5-56).
        Range sizes are parameterized so smaller mirrors also load.
        """
        from datasets import load_from_disk

        ds = load_from_disk(path).with_format("numpy")
        bounds = {
            "train": (0, n_train),
            "cal": (n_train, n_train + n_cal),
            "test": (n_train + n_cal, n_train + n_cal + n_test),
        }
        if split not in bounds:
            raise ValueError(f"split must be one of {sorted(bounds)}, got {split!r}")
        lo, hi = bounds[split]
        if subset is not None:
            hi = min(hi, lo + subset)
        rows = ds.select(range(lo, hi))
        outputs = np.stack([np.asarray(o) for o in rows["outputs"]])
        actions = np.stack([np.asarray(a) for a in rows["actions"]]).astype(np.float32)
        states = outputs[:, :, [1, 4, 6]].astype(np.float32)
        return cls(data=stack_and_pad(states, actions), state_phys=states)

    def __len__(self) -> int:
        return self.data.shape[0]
