"""Torch checkpoint interop for the conditional DDPM UNet.

Loads the reference's ``ckpt.pth`` list format
(DDPM/runners/diffusion.py:1187-1199: [model_sd, opt_sd, step, ema_sd], all
carrying the DataParallel ``module.`` prefix) into our Flax parameter pytree,
and exports back. Weight-layout conversions:

- Linear  (out, in)        -> Dense kernel (in, out)          [transpose]
- Conv2d  (O, I, kh, kw)   -> Conv kernel (kh, kw, I, O)      [permute]
- 1x1 attn Conv2d (O,I,1,1)-> Dense kernel (I, O)             [squeeze+T]
- Embedding                -> Embed.embedding                 [as-is]

BASELINE requires "interchangeable checkpoints" — round-trip is tested in
tests/test_torch_interop.py.
"""
from __future__ import annotations

import re
from typing import Any, Mapping

import numpy as np


def _set(tree: dict, path: list[str], value):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


_BLOCK_INNER = {
    "norm1.weight": ("norm1", "GroupNorm_0", "scale"),
    "norm1.bias": ("norm1", "GroupNorm_0", "bias"),
    "norm2.weight": ("norm2", "GroupNorm_0", "scale"),
    "norm2.bias": ("norm2", "GroupNorm_0", "bias"),
    "conv1.weight": ("conv1", "kernel"),
    "conv1.bias": ("conv1", "bias"),
    "conv2.weight": ("conv2", "kernel"),
    "conv2.bias": ("conv2", "bias"),
    "temb_cemb_proj.weight": ("emb_proj", "kernel"),
    "temb_cemb_proj.bias": ("emb_proj", "bias"),
    "nin_shortcut.weight": ("shortcut", "kernel"),
    "nin_shortcut.bias": ("shortcut", "bias"),
    "conv_shortcut.weight": ("shortcut", "kernel"),
    "conv_shortcut.bias": ("shortcut", "bias"),
}

_ATTN_INNER = {
    "norm.weight": ("norm", "GroupNorm_0", "scale"),
    "norm.bias": ("norm", "GroupNorm_0", "bias"),
    "q.weight": ("q", "kernel"),
    "q.bias": ("q", "bias"),
    "k.weight": ("k", "kernel"),
    "k.bias": ("k", "bias"),
    "v.weight": ("v", "kernel"),
    "v.bias": ("v", "bias"),
    "proj_out.weight": ("proj_out", "kernel"),
    "proj_out.bias": ("proj_out", "bias"),
}


def _convert_value(flax_path: tuple, torch_key: str, v: np.ndarray) -> np.ndarray:
    if flax_path[-1] != "kernel":
        return v
    if v.ndim == 4:
        if v.shape[2] == v.shape[3] == 1 and ("attn" in torch_key):
            return v[:, :, 0, 0].T          # 1x1 attn conv -> Dense
        return v.transpose(2, 3, 1, 0)      # conv OIHW -> HWIO
    if v.ndim == 2:
        return v.T                          # linear -> Dense
    return v


def torch_unet_state_to_flax(state_dict: Mapping[str, Any]) -> dict:
    """Map a reference Conditional_Model state dict to CondUNet params."""
    params: dict = {}
    for key, value in state_dict.items():
        k = key[len("module."):] if key.startswith("module.") else key
        v = np.asarray(value.detach().cpu().numpy()
                       if hasattr(value, "detach") else value, np.float32)

        m = re.match(r"temb\.dense\.(\d)\.(weight|bias)", k)
        if m:
            path = (f"temb_dense{m.group(1)}",
                    "kernel" if m.group(2) == "weight" else "bias")
        elif k == "classes_emb.weight":
            path = ("classes_emb", "embedding")
        elif k == "null_classes_emb":
            path = ("null_classes_emb",)
        elif (m := re.match(r"cemb\.dense\.(\d)\.(weight|bias)", k)):
            path = (f"cemb_dense{m.group(1)}",
                    "kernel" if m.group(2) == "weight" else "bias")
        elif (m := re.match(r"conv_(in|out)\.(weight|bias)", k)):
            path = (f"conv_{m.group(1)}",
                    "kernel" if m.group(2) == "weight" else "bias")
        elif (m := re.match(r"norm_out\.(weight|bias)", k)):
            path = ("norm_out", "GroupNorm_0",
                    "scale" if m.group(1) == "weight" else "bias")
        elif (m := re.match(r"(down|up)\.(\d+)\.block\.(\d+)\.(.*)", k)):
            path = (f"{m.group(1)}_{m.group(2)}_block_{m.group(3)}",
                    *_BLOCK_INNER[m.group(4)])
        elif (m := re.match(r"(down|up)\.(\d+)\.attn\.(\d+)\.(.*)", k)):
            path = (f"{m.group(1)}_{m.group(2)}_attn_{m.group(3)}",
                    *_ATTN_INNER[m.group(4)])
        elif (m := re.match(r"(down|up)\.(\d+)\.(down|up)sample\.conv\.(weight|bias)", k)):
            path = (f"{m.group(1)}_{m.group(2)}_{m.group(3)}sample", "conv",
                    "kernel" if m.group(4) == "weight" else "bias")
        elif (m := re.match(r"mid\.(block_1|attn_1|block_2)\.(.*)", k)):
            inner = _ATTN_INNER if "attn" in m.group(1) else _BLOCK_INNER
            path = (f"mid_{m.group(1)}", *inner[m.group(2)])
        elif k == "logvar":
            continue  # bayesian variant only; not a UNet weight
        else:
            raise KeyError(f"Unmapped torch key: {key}")

        _set(params, list(path), _convert_value(path, k, v))
    return params


def load_ddpm_reference_checkpoint(path: str) -> dict:
    """Load the reference list-format ``ckpt.pth``.

    Returns {"params", "ema_params" (or None), "step"}.
    """
    import torch

    states = torch.load(path, map_location="cpu", weights_only=False)
    params = torch_unet_state_to_flax(states[0])
    out = {"params": params, "ema_params": None, "step": int(states[2])}
    if len(states) > 3 and isinstance(states[-1], dict):
        # EMAHelper.state_dict(): shadow params keyed like the model's
        try:
            out["ema_params"] = torch_unet_state_to_flax(states[-1])
        except KeyError:
            pass
    return out


def _flatten(tree: dict, prefix=()) -> dict:
    flat = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            flat.update(_flatten(v, prefix + (k,)))
        else:
            flat[prefix + (k,)] = v
    return flat


def flax_unet_params_to_torch(params: dict) -> dict:
    """Inverse mapping: CondUNet params -> reference state-dict keys
    (without the ``module.`` prefix)."""
    inv_block = {v: k for k, v in _BLOCK_INNER.items()
                 if not k.startswith("conv_shortcut")}
    inv_attn = {v: k for k, v in _ATTN_INNER.items()}
    out = {}
    for path, v in _flatten(params).items():
        v = np.asarray(v, np.float32)
        head, rest = path[0], path[1:]
        if head.startswith(("temb_dense", "cemb_dense")):
            which, idx = head[:4], head[-1]
            tk = f"{which}.dense.{idx}.{'weight' if rest[0] == 'kernel' else 'bias'}"
            if rest[0] == "kernel":
                v = v.T
        elif head == "classes_emb":
            tk = "classes_emb.weight"
        elif head == "null_classes_emb":
            out["null_classes_emb"] = v
            continue
        elif head in ("conv_in", "conv_out"):
            tk = f"{head}.{'weight' if rest[0] == 'kernel' else 'bias'}"
            if rest[0] == "kernel":
                v = v.transpose(3, 2, 0, 1)
        elif head == "norm_out":
            tk = f"norm_out.{'weight' if rest[-1] == 'scale' else 'bias'}"
        elif (m := re.match(r"(down|up)_(\d+)_(block|attn)_(\d+)", head)):
            inv = inv_attn if m.group(3) == "attn" else inv_block
            inner = inv[rest]
            tk = f"{m.group(1)}.{m.group(2)}.{m.group(3)}.{m.group(4)}.{inner}"
            v = _to_torch_layout(rest, inner, v, is_attn=m.group(3) == "attn")
        elif (m := re.match(r"(down|up)_(\d+)_(down|up)sample", head)):
            tk = f"{m.group(1)}.{m.group(2)}.{m.group(3)}sample.conv." + (
                "weight" if rest[-1] == "kernel" else "bias")
            if rest[-1] == "kernel":
                v = v.transpose(3, 2, 0, 1)
        elif (m := re.match(r"mid_(block_1|attn_1|block_2)", head)):
            is_attn = "attn" in m.group(1)
            inv = inv_attn if is_attn else inv_block
            inner = inv[rest]
            tk = f"mid.{m.group(1)}.{inner}"
            v = _to_torch_layout(rest, inner, v, is_attn=is_attn)
        else:
            raise KeyError(f"Unmapped flax path: {path}")
        out[tk] = v
    return out


def _to_torch_layout(flax_rest: tuple, torch_inner: str, v: np.ndarray,
                     *, is_attn: bool) -> np.ndarray:
    if flax_rest[-1] != "kernel":
        return v
    if is_attn and v.ndim == 2:
        return v.T[:, :, None, None]        # Dense -> 1x1 conv
    if v.ndim == 4:
        return v.transpose(3, 2, 0, 1)      # HWIO -> OIHW
    if v.ndim == 2:
        return v.T
    return v
