"""Unified torch-classifier checkpoint loading for the pretrain CLIs.

The reference constructs every classifier family from torchvision with
IMAGENET1K weights and a re-initialized head (Classification/models/
{resnet,vit,swin}.py). Zero-egress equivalent: the user drops the
torchvision ``.pth`` locally and passes ``--torch_init``; the backbone is
converted (io/tv_resnet_interop.py, io/tv_vit_swin_interop.py) and overlaid
on a fresh Flax init, keeping freshly-initialized leaves wherever shapes
disagree — which re-creates the reference's head re-initialization (and
covers pos-embed size changes) without special cases.
"""
from __future__ import annotations

import logging

import jax
import numpy as np

log = logging.getLogger(__name__)


def load_torch_classifier(path: str, model_name: str) -> tuple[dict, dict]:
    """Convert a locally-supplied torch classifier checkpoint.

    Dispatches on the model family name (``ResNet*``/``ViT*``/``Swin*``,
    the create_model registry spellings); returns ``(params, batch_stats)``
    (batch_stats empty for the norm-free-stat transformer families)."""
    name = model_name.lower()
    if name.startswith("resnet"):
        from uurg_tpu.io.tv_resnet_interop import load_torch_resnet_checkpoint
        return load_torch_resnet_checkpoint(path)
    if name.startswith("vit"):
        from uurg_tpu.io.tv_vit_swin_interop import load_torch_vit_checkpoint
        params, dropped = load_torch_vit_checkpoint(path)
    elif name.startswith("swin"):
        from uurg_tpu.io.tv_vit_swin_interop import load_torch_swin_checkpoint
        params, dropped = load_torch_swin_checkpoint(path)
    else:
        raise ValueError(f"no torch converter for model family {model_name!r}")
    if dropped:
        log.info("torch_init: dropped %d non-live keys (%s...)",
                 len(dropped), dropped[0])
    return params, {}


def overlay_pretrained(init_tree: dict, loaded_tree: dict,
                       label: str = "params") -> dict:
    """Overlay converted torch leaves onto a fresh init, shape-permitting.

    A leaf is taken from ``loaded_tree`` iff the same path exists with the
    same shape; otherwise the fresh init survives (the reference's re-headed
    ``nn.Linear`` behavior). Logs every kept-fresh path so silent mismatches
    can't hide."""
    flat_loaded = dict(_flatten(loaded_tree))
    kept, used = [], 0

    def pick(path, leaf):
        nonlocal used
        key = tuple(p.key for p in path)
        cand = flat_loaded.get(key)
        if cand is not None and np.shape(cand) == np.shape(leaf):
            used += 1
            return jax.numpy.asarray(cand, dtype=leaf.dtype)
        kept.append("/".join(key))
        return leaf

    out = jax.tree_util.tree_map_with_path(pick, init_tree)
    log.info("torch_init[%s]: %d leaves loaded, %d kept fresh%s", label, used,
             len(kept), f" ({', '.join(kept[:6])})" if kept else "")
    return out


def _flatten(tree, prefix=()):
    if isinstance(tree, dict):
        for k, v in tree.items():
            yield from _flatten(v, prefix + (k,))
    else:
        yield prefix, tree
