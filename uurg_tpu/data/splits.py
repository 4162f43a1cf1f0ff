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


def incremental_random_split(
    ds: ArrayDataset,
    forget_ratio: float,
    num_stages: int,
    seed: int,
    save_path: str | None = None,
) -> list[tuple[ArrayDataset, ArrayDataset]]:
    """Incremental unlearning stages (Classification/dataset/cifar10.py
    IncrementalRandomUnlearn): one persisted permutation, cumulative forget
    sets of i/num_stages * ratio per stage. Returns [(remain_i, forget_i)].
    """
    n = len(ds)
    total_forget = int(n * forget_ratio)
    idx_file = (os.path.join(save_path, "incremental_idx.npy")
                if save_path else None)
    if idx_file and os.path.exists(idx_file):
        order = np.load(idx_file)
    else:
        order = np.random.default_rng(seed).permutation(n)[:total_forget]
        if idx_file:
            os.makedirs(save_path, exist_ok=True)
            np.save(idx_file, order)
    stages = []
    for i in range(1, num_stages + 1):
        k = total_forget * i // num_stages
        mask = np.zeros(n, dtype=bool)
        mask[order[:k]] = True
        stages.append((ds.subset(np.where(~mask)[0]),
                       ds.subset(np.where(mask)[0])))
    return stages


def create_class_labels(spec: str, n_classes: int = 10):
    """Parse the reference's class-list syntax
    (DDPM/functions/__init__.py:120-134): "1,2,3" selects classes; any
    "x<k>" entries EXCLUDE those classes from range(n_classes).
    Returns (class_list, excluded_list)."""
    parts = spec.split(",")
    if any(x.startswith("x") for x in parts):
        excluded = [int(x[1:]) for x in parts if x.startswith("x")]
        classes = [c for c in range(n_classes) if c not in excluded]
    else:
        excluded = []
        classes = [int(x) for x in parts]
    return classes, excluded
