"""Consolidate per-seed tokamak rollout npz files into one on-disk
HuggingFace dataset — the reference's data-preparation step between its
parallel generator and its training pipeline
(reference: tokamak/data/consolidate_dataset.py:10-58; per-seed files are
written by tokamak/kstar_data_generator_random_target.py as `{i}.npz`
containing a pickled dict with inputs/outputs/actions/targets).

The output is directly readable by
`safediffcon_tpu.tasks.tokamak.data.TokamakDataset.load_hf`.

Usage: python tools/consolidate_tokamak.py --path DIR [--start-idx N]
       [--end-idx M] [--out DIR/consolidated_dataset]
"""
from __future__ import annotations

import argparse
import os

import numpy as np


def consolidate_dataset(path: str, start_idx: int = 0, end_idx: int = 500):
    """Stack `{i}.npz` rollouts into a datasets.Dataset (reference
    consolidate_dataset, tokamak/data/consolidate_dataset.py:10-37)."""
    from datasets import Dataset

    stacks = {"inputs": [], "outputs": [], "actions": [], "targets": []}
    for i in range(start_idx, end_idx):
        data = np.load(os.path.join(path, f"{i}.npz"),
                       allow_pickle=True)["data"].item()
        for k in stacks:
            stacks[k].append(data[k])
    return Dataset.from_dict(
        {k: np.stack(v, axis=0) for k, v in stacks.items()}
    )


def main() -> int:
    ap = argparse.ArgumentParser(description="Consolidate tokamak rollouts")
    ap.add_argument("--path", required=True, help="dir with {i}.npz files")
    ap.add_argument("--start-idx", type=int, default=0)
    ap.add_argument("--end-idx", type=int, default=50000)
    ap.add_argument("--out", default=None,
                    help="output dir (default: PATH/consolidated_dataset)")
    args = ap.parse_args()

    ds = consolidate_dataset(args.path, args.start_idx, args.end_idx)
    out = args.out or os.path.join(args.path, "consolidated_dataset")
    ds.save_to_disk(out)
    print(f"{len(ds)} rows -> {out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
