"""SD workload data setup — reference-named helpers
(SD/train-scripts/dataset.py:120-176) over LOCAL image folders.

The reference pulls Imagenette and the nsfw/not-nsfw sets via HF
``load_dataset``; this environment has zero egress, so the same split
functions operate on folder layouts instead:

- Imagenette: ``<root>/<class_name>/*.png`` using the canonical ten class
  names (prompts become "an image of a <label>", matching the reference's
  descriptions list).
- NSFW / NOT-NSFW: flat folders of images (``data/nsfw``, ``data/not-nsfw``
  by convention, mirroring the reference's local dataset dirs).

Each setup_* returns (infinite batch iterator over float32 [-1,1] NHWC
images + labels, descriptions) like the reference's (DataLoader,
descriptions) pairs.
"""
from __future__ import annotations

import os

import numpy as np

from uurg_tpu.data.arrays import infinite_batches
from uurg_tpu.data.lazy import LazyImageFolder

# canonical Imagenette v2 class names (HF frgfm/imagenette label order)
IMAGENETTE_CLASSES = [
    "tench", "English springer", "cassette player", "chain saw", "church",
    "French horn", "garbage truck", "gas pump", "golf ball", "parachute",
]


def _descriptions(class_names) -> list[str]:
    return [f"an image of a {label}" for label in class_names]


def _signed(it):
    for x, y in it:
        yield x * 2.0 - 1.0, y


def _folder(root: str, image_size: int) -> LazyImageFolder:
    return LazyImageFolder(root, image_size)


def setup_data(class_to_forget, batch_size, image_size, root="data/imagenette"):
    """Full train stream + descriptions (dataset.py:120-129)."""
    ds = _folder(root, image_size)
    names = sorted(d for d in os.listdir(root)
                   if os.path.isdir(os.path.join(root, d)))
    it = _signed(infinite_batches(ds, batch_size, seed=0))
    return it, _descriptions(names)


def setup_forget_data(class_to_forget, batch_size, image_size,
                      root="data/imagenette", seed=0):
    """Forget-class-only stream (dataset.py:156-164)."""
    ds = _folder(root, image_size)
    names = sorted(d for d in os.listdir(root)
                   if os.path.isdir(os.path.join(root, d)))
    sub = ds.subset(np.where(ds.labels == class_to_forget)[0])
    return (_signed(infinite_batches(sub, batch_size, seed=seed)),
            _descriptions(names))


# GA uses the same forget-only stream with shuffling (dataset.py:132-141)
setup_ga_data = setup_forget_data


def setup_remain_data(class_to_forget, batch_size, image_size,
                      root="data/imagenette", seed=0):
    """All-but-forget-class stream (dataset.py:144-153)."""
    ds = _folder(root, image_size)
    names = sorted(d for d in os.listdir(root)
                   if os.path.isdir(os.path.join(root, d)))
    sub = ds.subset(np.where(ds.labels != class_to_forget)[0])
    return (_signed(infinite_batches(sub, batch_size, seed=seed)),
            _descriptions(names))


def setup_forget_nsfw_data(batch_size, image_size, nsfw_root="data/nsfw",
                           remain_root="data/not-nsfw", seed=0):
    """(forget stream, remain stream) over flat image folders
    (dataset.py:167-176). Flat folders get a single pseudo-class."""

    def flat(root):
        entries = [os.path.join(root, f) for f in sorted(os.listdir(root))
                   if f.lower().endswith((".png", ".jpg", ".jpeg", ".webp"))]
        if not entries:
            raise FileNotFoundError(f"no images under {root}")
        return LazyImageFolder(
            "", image_size, paths=np.asarray(entries),
            labels=np.zeros(len(entries), np.int64))

    f = _signed(infinite_batches(flat(nsfw_root), batch_size, seed=seed))
    r = _signed(infinite_batches(flat(remain_root), batch_size,
                                 seed=seed + 1))
    return f, r
