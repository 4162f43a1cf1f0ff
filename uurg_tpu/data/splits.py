"""Forget/remain dataset splitting.

Parity targets:
- class split: DDPM/dataset/__init__.py:120-177 get_forget_dataset (label
  scan -> remain/forget subsets).
- random split with persisted indices: Classification/dataset/cifar10.py:76-99
  (saves random_idx.npy so retrain/unlearn runs share the exact split).
"""
from __future__ import annotations

import os

import numpy as np

from uurg_tpu.data.arrays import ArrayDataset


def class_forget_split(ds: ArrayDataset, label_to_forget: int
                       ) -> tuple[ArrayDataset, ArrayDataset]:
    """Returns (remain, forget) keeping label order semantics."""
    forget_idx = np.where(ds.labels == label_to_forget)[0]
    remain_idx = np.where(ds.labels != label_to_forget)[0]
    return ds.subset(remain_idx), ds.subset(forget_idx)


def random_forget_split(
    ds: ArrayDataset,
    forget_ratio: float,
    seed: int,
    save_path: str | None = None,
) -> tuple[ArrayDataset, ArrayDataset]:
    """Random subset forgetting; persists/reuses ``random_idx.npy``."""
    n = len(ds)
    n_forget = int(n * forget_ratio)
    idx_file = os.path.join(save_path, "random_idx.npy") if save_path else None
    if idx_file and os.path.exists(idx_file):
        forget_idx = np.load(idx_file)
    else:
        rng = np.random.default_rng(seed)
        forget_idx = rng.permutation(n)[:n_forget]
        if idx_file:
            os.makedirs(save_path, exist_ok=True)
            np.save(idx_file, forget_idx)
    mask = np.zeros(n, dtype=bool)
    mask[forget_idx] = True
    return ds.subset(np.where(~mask)[0]), ds.subset(np.where(mask)[0])
