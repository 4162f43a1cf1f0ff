"""Dataset loaders: CIFAR-10/100, SVHN, TinyImageNet, image folders, synthetic.

Loaders read the standard on-disk formats directly (no torchvision
dependency): CIFAR python pickle batches, SVHN .mat, image folders via PIL.
Parity targets: Classification/dataset/{cifar10,cifar100,SVHN,
tinyimagenet}.py, DDPM/dataset/__init__.py:30-118, DiT/unlearn_dataset.py.

``synthetic_dataset`` provides deterministic fake data for tests and
benchmarks (the environment has no network egress).
"""
from __future__ import annotations

import os
import pickle
from typing import Sequence

import numpy as np

from uurg_tpu.core.registry import Registry
from uurg_tpu.data.arrays import ArrayDataset

dataset_registry = Registry("dataset")


def synthetic_dataset(n: int = 512, resolution: int = 32, channels: int = 3,
                      n_classes: int = 10, seed: int = 0,
                      base_seed: int | None = None,
                      class_affinity: float = 0.0,
                      noise_sigma: float = 0.1) -> ArrayDataset:
    """Class-structured fake images: each class has a distinct mean pattern
    so unlearning/eval logic is actually exercised.

    ``base_seed`` fixes the per-class mean patterns independently of the
    sample draw: a train/test pair generated with different ``seed`` but
    the SAME explicit ``base_seed`` (pass it on BOTH sides) shares one
    class distribution, so generalization is measurable. With
    ``base_seed=None`` the patterns come from the label-advanced ``seed``
    stream (legacy behavior, kept bit-stable) — two splits that differ in
    ``seed`` are then mutually unlearnable.

    ``class_affinity`` blends each class's mean toward its ring-successor:
    ``mean[c] = (1-a)*u[c] + a*u[(c+1) % n_classes]``. With a ~ 0.4 a
    forgotten class has a WELL-DEFINED nearest retained class (its
    successor), the way CIFAR's semantically-close classes do — without it
    the classes are mutually equidistant and a retrained model's
    predictions on forget samples are per-sample noise, making the
    JS-vs-Retrain comparison (Classification/evaluation/js_div.py:17-29)
    unattainable for ANY unlearning method. Default 0.0 = bit-stable
    legacy patterns.

    ``noise_sigma`` sets the per-sample Gaussian noise around the class
    mean. The 0.1 default makes the task trivially generalizable — members
    and non-members are then indistinguishable to a membership attacker
    and the SVC-MIA columns saturate at the 0/1 boundary (round-4 verdict:
    a degenerate discriminator). Raising it (the efficacy gate uses ~0.5)
    opens a real train/test confidence gap, the way CIFAR overfitting
    does, so Retrain's SVC-MIA lands strictly inside (0,1) and
    over-forgetting becomes detectable."""
    rng = np.random.default_rng(seed)
    labels = rng.integers(0, n_classes, n).astype(np.int64)
    base_rng = rng if base_seed is None else np.random.default_rng(base_seed)
    base = base_rng.random(
        (n_classes, resolution, resolution, channels)).astype(np.float32)
    if class_affinity > 0.0:
        a = float(class_affinity)
        base = (1.0 - a) * base + a * np.roll(base, -1, axis=0)
    noise = rng.normal(0, noise_sigma,
                       (n, resolution, resolution, channels))
    images = np.clip(base[labels] + noise.astype(np.float32), 0, 1)
    return ArrayDataset(images, labels)


def load_cifar10(root: str, train: bool = True) -> ArrayDataset:
    """Read cifar-10-batches-py pickle files -> NHWC uint8."""
    d = os.path.join(root, "cifar-10-batches-py")
    files = ([f"data_batch_{i}" for i in range(1, 6)] if train
             else ["test_batch"])
    xs, ys = [], []
    for fname in files:
        with open(os.path.join(d, fname), "rb") as f:
            entry = pickle.load(f, encoding="latin1")
        xs.append(entry["data"])
        ys.extend(entry.get("labels", entry.get("fine_labels")))
    x = np.concatenate(xs).reshape(-1, 3, 32, 32).transpose(0, 2, 3, 1)
    return ArrayDataset(np.ascontiguousarray(x), np.asarray(ys, np.int64))


def load_cifar100(root: str, train: bool = True) -> ArrayDataset:
    d = os.path.join(root, "cifar-100-python")
    fname = "train" if train else "test"
    with open(os.path.join(d, fname), "rb") as f:
        entry = pickle.load(f, encoding="latin1")
    x = np.asarray(entry["data"]).reshape(-1, 3, 32, 32).transpose(0, 2, 3, 1)
    return ArrayDataset(np.ascontiguousarray(x),
                        np.asarray(entry["fine_labels"], np.int64))


def load_svhn(root: str, train: bool = True) -> ArrayDataset:
    import scipy.io as sio

    fname = "train_32x32.mat" if train else "test_32x32.mat"
    mat = sio.loadmat(os.path.join(root, fname))
    x = np.transpose(mat["X"], (3, 0, 1, 2))  # HWCN -> NHWC
    y = mat["y"].astype(np.int64).squeeze()
    y[y == 10] = 0
    return ArrayDataset(np.ascontiguousarray(x), y)


def load_stl10(root: str, train: bool = True) -> ArrayDataset:
    """STL-10 binary format (96x96x3, CHW column-major per image)
    (DDPM/dataset/__init__.py STL10 support)."""
    split = "train" if train else "test"
    with open(os.path.join(root, "stl10_binary", f"{split}_X.bin"), "rb") as f:
        x = np.frombuffer(f.read(), np.uint8).reshape(-1, 3, 96, 96)
        x = np.transpose(x, (0, 3, 2, 1))  # CHW col-major -> NHWC
    with open(os.path.join(root, "stl10_binary", f"{split}_y.bin"), "rb") as f:
        y = np.frombuffer(f.read(), np.uint8).astype(np.int64) - 1
    return ArrayDataset(np.ascontiguousarray(x), y)


def load_tinyimagenet(root: str, train: bool = True) -> ArrayDataset:
    """TinyImageNet: npz archive {'images','labels'} or an ImageFolder tree
    (train/<wnid>/images/*.JPEG). Covers the reference's pickled-tensor
    loader semantics (Classification/dataset/tinyimagenet.py:23-73)."""
    split = "train" if train else "val"
    npz = os.path.join(root, f"tinyimagenet_{split}.npz")
    if os.path.exists(npz):
        d = np.load(npz)
        return ArrayDataset(d["images"], d["labels"].astype(np.int64))
    folder = os.path.join(root, "tiny-imagenet-200", split)
    if os.path.isdir(folder):
        return load_image_folder(folder, 64, center_crop=False)
    raise FileNotFoundError(f"no TinyImageNet under {root}")


def load_image_folder(root: str, resolution: int,
                      class_names: Sequence[str] | None = None,
                      center_crop: bool = True) -> ArrayDataset:
    """ImageFolder-style loader (subdir per class), PIL-based.

    ``class_names`` restricts to a class subset while PRESERVING the global
    class->index map (DiT/unlearn_dataset.py:37-292 TargetedImageFolder)."""
    from PIL import Image

    all_classes = sorted(
        d for d in os.listdir(root) if os.path.isdir(os.path.join(root, d)))
    class_to_idx = {c: i for i, c in enumerate(all_classes)}
    wanted = class_names if class_names is not None else all_classes
    xs, ys = [], []
    for cname in wanted:
        cdir = os.path.join(root, cname)
        for fname in sorted(os.listdir(cdir)):
            if not fname.lower().endswith((".png", ".jpg", ".jpeg", ".webp")):
                continue
            img = Image.open(os.path.join(cdir, fname)).convert("RGB")
            if center_crop:
                img = _center_crop_resize(img, resolution)
            else:
                img = img.resize((resolution, resolution), Image.BICUBIC)
            xs.append(np.asarray(img, np.uint8))
            ys.append(class_to_idx[cname])
    if not xs:
        raise FileNotFoundError(f"no images under {root}")
    return ArrayDataset(np.stack(xs), np.asarray(ys, np.int64))


def _center_crop_resize(img, size: int):
    """ADM-style center crop (DiT/forget.py center_crop_arr parity)."""
    from PIL import Image

    while min(img.size) >= 2 * size:
        img = img.resize((img.size[0] // 2, img.size[1] // 2), Image.BOX)
    scale = size / min(img.size)
    img = img.resize((round(img.size[0] * scale), round(img.size[1] * scale)),
                     Image.BICUBIC)
    arr = np.asarray(img)
    y = (arr.shape[0] - size) // 2
    x = (arr.shape[1] - size) // 2
    return Image.fromarray(arr[y : y + size, x : x + size])


dataset_registry.register("CIFAR10", load_cifar10)
dataset_registry.register("CIFAR100", load_cifar100)
dataset_registry.register("SVHN", load_svhn)
dataset_registry.register("STL10", load_stl10)
dataset_registry.register("TinyImagenet", load_tinyimagenet)
dataset_registry.register("synthetic", synthetic_dataset)
