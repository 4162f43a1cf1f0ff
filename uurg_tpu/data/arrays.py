"""Host-side array datasets and infinite shuffled batchers.

The TPU-native replacement for the reference's DataLoader + ``cycle()`` idiom
(DDPM/functions/__init__.py:123-126 et al.): datasets are in-memory numpy
arrays (CIFAR-scale data fits trivially), batches are drawn by an infinite
shuffled index stream, and multi-host sharding is a process-strided slice of
that stream — no worker processes, no collate, no scatter/gather.
"""
from __future__ import annotations

import dataclasses
from typing import Callable, Iterator

import numpy as np


@dataclasses.dataclass
class ArrayDataset:
    """Images NHWC uint8 or float32 in [0,1]; labels int."""

    images: np.ndarray
    labels: np.ndarray

    def __post_init__(self):
        assert len(self.images) == len(self.labels)

    def __len__(self) -> int:
        return len(self.images)

    def subset(self, idx: np.ndarray) -> "ArrayDataset":
        return ArrayDataset(self.images[idx], self.labels[idx])

    def images_f32(self) -> np.ndarray:
        if self.images.dtype == np.uint8:
            return self.images.astype(np.float32) / 255.0
        return self.images.astype(np.float32)

    def get_batch(self, idx: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """(float32 [0,1] images, int32 labels) for these indices — the
        common protocol shared with the disk-backed datasets in
        uurg_tpu.data.lazy (only the touched rows are converted)."""
        x = self.images[idx]
        if x.dtype == np.uint8:
            x = x.astype(np.float32) / 255.0
        else:
            x = x.astype(np.float32)
        return x, self.labels[idx].astype(np.int32)


def random_flip_batch(x: np.ndarray, rng: np.random.Generator) -> np.ndarray:
    """Horizontal random flip, per-sample (data.random_flip: true)."""
    flip = rng.random(len(x)) < 0.5
    x = x.copy()
    x[flip] = x[flip, :, ::-1, :]
    return x


def pad_crop_batch(x: np.ndarray, pad: int, rng: np.random.Generator) -> np.ndarray:
    """Random-crop after zero padding (classification aug), fully vectorized
    (single gather, no per-image python loop)."""
    n, h, w, c = x.shape
    padded = np.zeros((n, h + 2 * pad, w + 2 * pad, c), x.dtype)
    padded[:, pad:-pad, pad:-pad, :] = x
    ys = rng.integers(0, 2 * pad + 1, n)
    xs = rng.integers(0, 2 * pad + 1, n)
    rows = ys[:, None] + np.arange(h)[None, :]          # (n, h)
    cols = xs[:, None] + np.arange(w)[None, :]          # (n, w)
    return padded[np.arange(n)[:, None, None],
                  rows[:, :, None], cols[:, None, :], :]


def _shift_zero_fill(x: np.ndarray, shift: int, axis: int) -> np.ndarray:
    """Shift a batch along ``axis`` with zero fill (affine translate)."""
    out = np.zeros_like(x)
    src = [slice(None)] * x.ndim
    dst = [slice(None)] * x.ndim
    if shift >= 0:
        dst[axis] = slice(shift, None)
        src[axis] = slice(None, x.shape[axis] - shift)
    else:
        dst[axis] = slice(None, shift)
        src[axis] = slice(-shift, None)
    out[tuple(dst)] = x[tuple(src)]
    return out


def rand_augment_batch(x: np.ndarray, rng: np.random.Generator,
                       num_ops: int = 2, magnitude: float = 9.0
                       ) -> np.ndarray:
    """Light numpy RandAugment (TinyImageNet recipe parity —
    Classification/dataset/tinyimagenet.py uses torchvision RandAugment).

    Vectorized ops on float32 [0,1] NHWC batches: brightness, contrast,
    solarize, posterize, translate-x/y, flip. Per-sample op choice."""
    n = len(x)
    m = magnitude / 30.0
    out = x.copy()
    for _ in range(num_ops):
        ops = rng.integers(0, 6, n)
        signs = rng.choice([-1.0, 1.0], n)
        for op in range(6):
            idx = np.where(ops == op)[0]
            if len(idx) == 0:
                continue
            sub = out[idx]
            if op == 0:    # brightness
                sub = np.clip(sub + signs[idx, None, None, None] * m, 0, 1)
            elif op == 1:  # contrast
                mean = sub.mean(axis=(1, 2, 3), keepdims=True)
                f = 1.0 + signs[idx, None, None, None] * m
                sub = np.clip(mean + (sub - mean) * f, 0, 1)
            elif op == 2:  # solarize
                thresh = 1.0 - m
                sub = np.where(sub >= thresh, 1.0 - sub, sub)
            elif op == 3:  # posterize
                bits = max(1, int(8 - 4 * m))
                q = 2**bits
                sub = np.floor(sub * q) / q
            elif op in (4, 5):  # translate-x / translate-y (zero-fill, like
                # torchvision RandAugment affine translate — not wraparound)
                axis = 2 if op == 4 else 1
                mag = int(m * sub.shape[axis] * 0.3) or 1
                for s in (-1, 1):
                    grp = signs[idx] == s
                    if not grp.any():
                        continue
                    sub[grp] = _shift_zero_fill(sub[grp], s * mag, axis)
            out[idx] = sub
    return out


def epoch_batches(
    ds: ArrayDataset,
    batch_size: int,
    *,
    shuffle: bool = False,
    seed: int = 0,
    drop_last: bool = False,
    transform: Callable | None = None,
) -> Iterator[tuple[np.ndarray, np.ndarray]]:
    """One pass over the dataset (for Fisher accumulation / eval). Works on
    any dataset exposing the ``get_batch(idx)`` protocol (in-memory arrays
    or the lazy disk-backed folders)."""
    rng = np.random.default_rng(seed)
    idx = np.arange(len(ds))
    if shuffle:
        rng.shuffle(idx)
    end = len(idx) - (len(idx) % batch_size) if drop_last else len(idx)
    for start in range(0, end, batch_size):
        take = idx[start : start + batch_size]
        x, y = ds.get_batch(take)
        if transform is not None:
            x = transform(x, rng)
        yield x, y


def infinite_batches(
    ds: ArrayDataset,
    batch_size: int,
    *,
    seed: int = 0,
    transform: Callable | None = None,
    process_index: int = 0,
    process_count: int = 1,
) -> Iterator[tuple[np.ndarray, np.ndarray]]:
    """Infinite reshuffled stream (the ``cycle(DataLoader)`` replacement).

    With multiple hosts, each host takes a strided slice of every global
    batch — the grain/tfds-style per-host sharding from SURVEY.md section 7.
    """
    rng = np.random.default_rng(seed)
    n = len(ds)
    while True:
        perm = rng.permutation(n)
        if n < batch_size:
            # dataset smaller than a batch (e.g. a 10% forget split under a
            # large batch size): wrap the permutation so the batch shape
            # stays jit-static and every sample appears at least once.
            # (Without this the ranged loop below is EMPTY and the stream
            # never yields — a silent infinite spin.)
            take = np.resize(perm, batch_size)[process_index::process_count]
            x, y = ds.get_batch(take)
            if transform is not None:
                x = transform(x, rng)
            yield x, y
            continue
        for start in range(0, n - batch_size + 1, batch_size):
            take = perm[start : start + batch_size]
            take = take[process_index::process_count]
            x, y = ds.get_batch(take)
            if transform is not None:
                x = transform(x, rng)
            yield x, y
