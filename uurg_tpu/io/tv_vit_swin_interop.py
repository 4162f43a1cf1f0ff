"""torchvision ViT-B/16 and Swin checkpoints -> Flax params.

The reference builds its ViT/Swin classifiers straight from torchvision with
IMAGENET1K weights and a re-initialized head
(Classification/models/vit.py:4-8, Classification/models/swin.py:4-19).
This environment has no download path, so parity runs on locally-supplied
``.pth`` files; these converters map the torchvision state-dict layouts onto
``uurg_tpu.models.vit.ViT`` / ``uurg_tpu.models.swin.Swin`` exactly
(tests/test_tv_vit_swin_interop.py validates full forwards against
hand-built torch replicas of the torchvision modules).

Layout rules, beyond the usual conv OIHW->HWIO / linear (out,in)->(in,out):

- ViT attention: torch ``in_proj_weight`` stacks [q;k;v] along the output
  dim, each head-major — identical to our fused ``qkv`` Dense reshaped as
  (T, 3, H, D/H), so a plain transpose suffices.
- ViT head quirk: the reference assigns ``model.head = nn.Linear(...)``,
  but torchvision's forward calls ``self.heads`` — the re-initialized head
  is DANGLING and the trained logits come from the original 1000-way
  ``heads.head``. The converter therefore prefers ``heads.head`` (what the
  network actually computes) and exposes any bare ``head.*`` keys in the
  returned ``dropped`` list for the caller to inspect.
- Swin patch merging: torchvision concatenates the 2x2 sub-grid as
  [(h0,w0),(h1,w0),(h0,w1),(h1,w1)] while our reshape-transpose produces
  [(h0,w0),(h0,w1),(h1,w0),(h1,w1)] — the 4C input axes of the merge
  LayerNorm and reduction matrix are permuted by C-sized blocks [0,2,1,3].
- Swin ``relative_position_index`` is a buffer we recompute; dropped.
"""
from __future__ import annotations

import re
from typing import Any, Mapping

import numpy as np

from uurg_tpu.io.tv_resnet_interop import _np, _set


def _ln(params, base, field, v):
    _set(params, base + [{"weight": "scale", "bias": "bias"}[field]], v)


def _dense(params, base, field, v):
    _set(params, base + ["kernel" if field == "weight" else "bias"],
         v.T if field == "weight" else v)


def torch_vit_to_flax(state_dict: Mapping[str, Any],
                      strict: bool = True) -> tuple[dict, list[str]]:
    """Convert a torchvision ``vit_b_16``-layout state dict to Flax params.

    Returns ``(params, dropped)`` where ``dropped`` lists keys intentionally
    not mapped (the reference's dangling re-initialized ``head.*`` when the
    live ``heads.head`` is also present). With ``strict``, any key that is
    neither mapped nor intentionally dropped raises ValueError."""
    keys = {k[len("module."):] if k.startswith("module.") else k: v
            for k, v in state_dict.items()}
    has_tv_head = any(k.startswith("heads.") for k in keys)
    params: dict = {}
    dropped: list[str] = []
    unknown: list[str] = []
    for k, raw in keys.items():
        v = _np(raw)
        parts = k.split(".")
        if k == "class_token":
            _set(params, ["cls_token"], v)
        elif k == "encoder.pos_embedding":
            _set(params, ["pos_embed"], v)
        elif parts[0] == "conv_proj":
            if parts[1] == "weight":
                _set(params, ["patch_embed", "kernel"], v.transpose(2, 3, 1, 0))
            else:
                _set(params, ["patch_embed", "bias"], v)
        elif k.startswith("encoder.ln."):
            _ln(params, ["ln_final"], parts[-1], v)
        elif k.startswith("heads."):
            # torchvision: heads = Sequential(OrderedDict(head=Linear))
            _dense(params, ["head"], parts[-1], v)
        elif parts[0] == "head":
            if has_tv_head:
                dropped.append(k)  # dangling reference re-init (see docstring)
            else:
                _dense(params, ["head"], parts[-1], v)
        elif (m := re.match(r"encoder\.layers\.encoder_layer_(\d+)\.(.*)", k)):
            base = [f"block_{int(m.group(1))}"]
            rest = m.group(2)
            rparts = rest.split(".")
            if rparts[0] == "ln_1":
                _ln(params, base + ["ln1"], rparts[1], v)
            elif rparts[0] == "ln_2":
                _ln(params, base + ["ln2"], rparts[1], v)
            elif rest.startswith("self_attention.in_proj_"):
                _dense(params, base + ["attn", "qkv"], rparts[-1][len("in_proj_"):], v)
            elif rest.startswith("self_attention.out_proj."):
                _dense(params, base + ["attn", "proj"], rparts[-1], v)
            elif rparts[0] == "mlp" and rparts[1] in ("0", "linear_1"):
                _dense(params, base + ["fc1"], rparts[-1], v)
            elif rparts[0] == "mlp" and rparts[1] in ("3", "linear_2"):
                _dense(params, base + ["fc2"], rparts[-1], v)
            else:
                unknown.append(k)
        else:
            unknown.append(k)
    if unknown and strict:
        raise ValueError(f"unrecognized torch ViT keys: {unknown[:8]}"
                         f"{'...' if len(unknown) > 8 else ''}")
    return params, dropped


# torchvision SwinTransformer features index -> (kind, ours index):
# 0 = patch embed, odd = stage blocks, even>0 = patch merging.
def _swin_feature(idx: int) -> tuple[str, int]:
    if idx == 0:
        return "embed", 0
    if idx % 2 == 1:
        return "stage", (idx - 1) // 2
    return "merge", idx // 2 - 1


def _merge_perm(v: np.ndarray, axis: int) -> np.ndarray:
    """Permute a 4C axis from torch sub-grid order to ours ([0,2,1,3] blocks)."""
    blocks = np.split(v, 4, axis=axis)
    return np.concatenate([blocks[0], blocks[2], blocks[1], blocks[3]], axis=axis)


def torch_swin_to_flax(state_dict: Mapping[str, Any],
                       strict: bool = True) -> tuple[dict, list[str]]:
    """Convert a torchvision ``swin_t/s/b``-layout state dict to Flax params.

    Returns ``(params, dropped)``; ``dropped`` holds the recomputed
    ``relative_position_index`` buffers."""
    params: dict = {}
    dropped: list[str] = []
    unknown: list[str] = []
    for key, raw in state_dict.items():
        k = key[len("module."):] if key.startswith("module.") else key
        v = _np(raw)
        parts = k.split(".")
        if parts[0] == "norm":
            _ln(params, ["ln_final"], parts[1], v)
        elif parts[0] == "head":
            _dense(params, ["head"], parts[1], v)
        elif parts[0] == "features":
            kind, i = _swin_feature(int(parts[1]))
            if kind == "embed":
                # features.0.0 = Conv2d, features.0.2 = LayerNorm
                if parts[2] == "0":
                    if parts[3] == "weight":
                        _set(params, ["patch_embed", "kernel"],
                             v.transpose(2, 3, 1, 0))
                    else:
                        _set(params, ["patch_embed", "bias"], v)
                else:
                    _ln(params, ["ln_embed"], parts[3], v)
            elif kind == "merge":
                base = [f"merge{i}"]
                if parts[2] == "norm":
                    _ln(params, base + ["ln"], parts[3], _merge_perm(v, 0))
                elif parts[2] == "reduction":  # (2C, 4C), no bias
                    _set(params, base + ["reduction", "kernel"],
                         _merge_perm(v, 1).T)
                else:
                    unknown.append(key)
            else:  # stage blocks: features.{f}.{j}.<module>...
                j = int(parts[2])
                base = [f"stage{i}_block{j}"]
                mod = parts[3]
                if mod == "norm1":
                    _ln(params, base + ["ln1"], parts[4], v)
                elif mod == "norm2":
                    _ln(params, base + ["ln2"], parts[4], v)
                elif mod == "attn":
                    sub = parts[4]
                    if sub == "relative_position_bias_table":
                        _set(params, base + ["attn", "rel_pos_bias"], v)
                    elif sub == "relative_position_index":
                        dropped.append(key)  # recomputed statically
                    elif sub in ("qkv", "proj"):
                        _dense(params, base + ["attn", sub], parts[5], v)
                    else:
                        unknown.append(key)
                elif mod == "mlp" and parts[4] == "0":
                    _dense(params, base + ["fc1"], parts[5], v)
                elif mod == "mlp" and parts[4] == "3":
                    _dense(params, base + ["fc2"], parts[5], v)
                else:
                    unknown.append(key)
        else:
            unknown.append(key)
    if unknown and strict:
        raise ValueError(f"unrecognized torch Swin keys: {unknown[:8]}"
                         f"{'...' if len(unknown) > 8 else ''}")
    return params, dropped


def load_torch_vit_checkpoint(path: str) -> tuple[dict, list[str]]:
    return _load(path, torch_vit_to_flax)


def load_torch_swin_checkpoint(path: str) -> tuple[dict, list[str]]:
    return _load(path, torch_swin_to_flax)


def _load(path: str, convert):
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=True)
    for key in ("state_dict", "model"):
        if isinstance(obj, dict) and key in obj and isinstance(obj[key], dict):
            obj = obj[key]
    return convert(obj)
