"""torch ResNet checkpoint -> Flax (params, batch_stats) converter.

Covers two torch naming schemas with one key map:

- **torchvision** ResNets (``conv1/bn1/layer{1-4}.{j}/downsample/fc``) — the
  UA classifier probe is a fine-tuned torchvision ResNet-34 at 224px
  (DDPM/classifier_evaluation.py:16-40, DDPM/train_classifier.py:12-200);
  convert with ``imagenet_stem=True`` models.
- **CIFAR-style** reference classifiers (``conv1/bn1/layer{1-4}.{j}/
  shortcut/linear`` — Classification/models/resnet.py) saved by
  main_pretrain.py.

Layout rules: conv OIHW -> HWIO, linear (out,in) -> (in,out), BatchNorm
weight/bias -> scale/bias + running stats into the ``batch_stats``
collection. ``num_batches_tracked`` is dropped. The Flax ResNet uses
explicit torch-style padding (models/resnet.py), so converted networks are
numerically exact (see tests/test_tv_resnet_interop.py torch replica).
"""
from __future__ import annotations

import re
from typing import Any, Mapping

import numpy as np


def _np(v) -> np.ndarray:
    if hasattr(v, "detach"):
        v = v.detach().cpu().numpy()
    return np.asarray(v)


def _set(tree: dict, path: list[str], value) -> None:
    node = tree
    for k in path[:-1]:
        node = node.setdefault(k, {})
    node[path[-1]] = value


_BN_PARAM = {"weight": "scale", "bias": "bias"}
_BN_STAT = {"running_mean": "mean", "running_var": "var"}


def torch_resnet_to_flax(state_dict: Mapping[str, Any],
                         strict: bool = True) -> tuple[dict, dict]:
    """Convert a torch ResNet state dict to ``(params, batch_stats)``.

    Accepts torchvision and reference-CIFAR naming; DataParallel
    ``module.`` prefixes are stripped. With ``strict`` every key must be
    recognized (else ValueError)."""
    params: dict = {}
    stats: dict = {}
    unknown = []
    for key, v in state_dict.items():
        k = key[len("module."):] if key.startswith("module.") else key
        if k.endswith("num_batches_tracked"):
            continue
        v = _np(v)
        parts = k.split(".")

        # head: fc (torchvision) / linear (reference CIFAR)
        if parts[0] in ("fc", "linear"):
            if parts[1] == "weight":
                _set(params, ["fc", "kernel"], v.T)
            else:
                _set(params, ["fc", "bias"], v)
            continue
        # stem
        if parts[0] == "conv1":
            _set(params, ["conv_stem", "kernel"], v.transpose(2, 3, 1, 0))
            continue
        if parts[0] == "bn1":
            _dispatch_bn(params, stats, ["bn_stem"], parts[1], v)
            continue
        # stages
        m = re.match(r"layer(\d+)$", parts[0])
        if m:
            stage = int(m.group(1)) - 1
            block = int(parts[1])
            base = [f"stage{stage}_block{block}"]
            inner = parts[2]
            if inner in ("downsample", "shortcut"):
                # .0 = conv, .1 = bn
                which = parts[3]
                if which == "0":
                    _set(params, base + ["sc_conv", "kernel"],
                         v.transpose(2, 3, 1, 0))
                else:
                    _dispatch_bn(params, stats, base + ["sc_bn"], parts[4], v)
                continue
            cm = re.match(r"conv(\d)$", inner)
            if cm:
                _set(params, base + [inner, "kernel"],
                     v.transpose(2, 3, 1, 0))
                continue
            bm = re.match(r"bn(\d)$", inner)
            if bm:
                _dispatch_bn(params, stats, base + [inner], parts[3], v)
                continue
        unknown.append(key)
    if unknown and strict:
        raise ValueError(f"unrecognized torch keys: {unknown[:8]}"
                         f"{'...' if len(unknown) > 8 else ''}")
    return params, stats


def _dispatch_bn(params, stats, base, field, v):
    if field in _BN_PARAM:
        _set(params, base + [_BN_PARAM[field]], v)
    elif field in _BN_STAT:
        _set(stats, base + [_BN_STAT[field]], v)
    else:
        raise ValueError(f"unknown BN field {field} at {base}")


def load_torch_resnet_checkpoint(path: str) -> tuple[dict, dict]:
    """Load a ``.pth``/``.pt`` ResNet checkpoint from disk and convert.

    Handles the common containers: a bare state dict, ``{"state_dict": ...}``
    or ``{"model": ...}`` wrappers (DDPM/train_classifier.py saves
    ``model.state_dict()`` directly)."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=True)
    for key in ("state_dict", "model"):
        if isinstance(obj, dict) and key in obj and isinstance(obj[key], dict):
            obj = obj[key]
    return torch_resnet_to_flax(obj)
