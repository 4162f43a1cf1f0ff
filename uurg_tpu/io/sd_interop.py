"""CompVis Stable-Diffusion UNet checkpoint interop.

Maps the CompVis/LDM UNetModel state dict (the ``model.diffusion_model.*``
subtree of sd-v1-*.ckpt — SD/ldm/modules/diffusionmodules/
openaimodel.py:428-1064) to our Flax SDUNet parameter tree and back. This is
the live half of the reference's 1,128-line convertModels.py key surgery
(UNet only; VAE/CLIP converters follow the same recipe).

Layout conversions: conv OIHW -> HWIO; linear (out, in) -> (in, out);
GEGLU proj splits stay fused (same layout in both).
"""
from __future__ import annotations

from typing import Iterator

import numpy as np

from uurg_tpu.models.sd_unet import SDUNetConfig


def _resblock_pairs(ours: str) -> list[tuple[str, tuple]]:
    """CompVis ResBlock inner name -> our (module, leaf) suffix."""
    return [
        ("in_layers.0.weight", (ours, "norm1", "GroupNorm_0", "scale")),
        ("in_layers.0.bias", (ours, "norm1", "GroupNorm_0", "bias")),
        ("in_layers.2.weight", (ours, "conv1", "kernel")),
        ("in_layers.2.bias", (ours, "conv1", "bias")),
        ("emb_layers.1.weight", (ours, "emb_proj", "kernel")),
        ("emb_layers.1.bias", (ours, "emb_proj", "bias")),
        ("out_layers.0.weight", (ours, "norm2", "GroupNorm_0", "scale")),
        ("out_layers.0.bias", (ours, "norm2", "GroupNorm_0", "bias")),
        ("out_layers.3.weight", (ours, "conv2", "kernel")),
        ("out_layers.3.bias", (ours, "conv2", "bias")),
        ("skip_connection.weight", (ours, "skip", "kernel")),
        ("skip_connection.bias", (ours, "skip", "bias")),
    ]


def _attn_pairs(ours: str) -> list[tuple[str, tuple]]:
    out = [
        ("norm.weight", (ours, "norm", "GroupNorm_0", "scale")),
        ("norm.bias", (ours, "norm", "GroupNorm_0", "bias")),
        ("proj_in.weight", (ours, "proj_in", "kernel")),
        ("proj_in.bias", (ours, "proj_in", "bias")),
        ("proj_out.weight", (ours, "proj_out", "kernel")),
        ("proj_out.bias", (ours, "proj_out", "bias")),
    ]
    t = "transformer_blocks.0"
    tb = (ours, "tblock_0")
    for attn in ("attn1", "attn2"):
        for qkv in ("to_q", "to_k", "to_v"):
            out.append((f"{t}.{attn}.{qkv}.weight", (*tb, attn, qkv, "kernel")))
        out.append((f"{t}.{attn}.to_out.0.weight", (*tb, attn, "to_out", "kernel")))
        out.append((f"{t}.{attn}.to_out.0.bias", (*tb, attn, "to_out", "bias")))
    for i, norm in enumerate(("norm1", "norm2", "norm3"), 1):
        out.append((f"{t}.{norm}.weight", (*tb, norm, "scale")))
        out.append((f"{t}.{norm}.bias", (*tb, norm, "bias")))
    out.append((f"{t}.ff.net.0.proj.weight", (*tb, "ff_geglu", "proj", "kernel")))
    out.append((f"{t}.ff.net.0.proj.bias", (*tb, "ff_geglu", "proj", "bias")))
    out.append((f"{t}.ff.net.2.weight", (*tb, "ff_out", "kernel")))
    out.append((f"{t}.ff.net.2.bias", (*tb, "ff_out", "bias")))
    return out


def sd_unet_key_map(cfg: SDUNetConfig = SDUNetConfig()
                    ) -> Iterator[tuple[str, tuple]]:
    """Yields (compvis_key, our_path) pairs for the whole UNet."""
    yield ("time_embed.0.weight", ("time_embed_0", "kernel"))
    yield ("time_embed.0.bias", ("time_embed_0", "bias"))
    yield ("time_embed.2.weight", ("time_embed_2", "kernel"))
    yield ("time_embed.2.bias", ("time_embed_2", "bias"))
    yield ("input_blocks.0.0.weight", ("conv_in", "kernel"))
    yield ("input_blocks.0.0.bias", ("conv_in", "bias"))

    idx = 1
    ds = 1
    n_levels = len(cfg.channel_mult)
    for i in range(n_levels):
        for j in range(cfg.num_res_blocks):
            base = f"input_blocks.{idx}"
            for ck, ours in _resblock_pairs(f"down_{i}_res_{j}"):
                yield (f"{base}.0.{ck}", ours)
            if ds in cfg.attention_ds:
                for ck, ours in _attn_pairs(f"down_{i}_attn_{j}"):
                    yield (f"{base}.1.{ck}", ours)
            idx += 1
        if i != n_levels - 1:
            yield (f"input_blocks.{idx}.0.op.weight",
                   (f"down_{i}_downsample", "kernel"))
            yield (f"input_blocks.{idx}.0.op.bias",
                   (f"down_{i}_downsample", "bias"))
            idx += 1
            ds *= 2

    for ck, ours in _resblock_pairs("mid_res_1"):
        yield (f"middle_block.0.{ck}", ours)
    for ck, ours in _attn_pairs("mid_attn"):
        yield (f"middle_block.1.{ck}", ours)
    for ck, ours in _resblock_pairs("mid_res_2"):
        yield (f"middle_block.2.{ck}", ours)

    idx = 0
    for i in reversed(range(n_levels)):
        for j in range(cfg.num_res_blocks + 1):
            base = f"output_blocks.{idx}"
            for ck, ours in _resblock_pairs(f"up_{i}_res_{j}"):
                yield (f"{base}.0.{ck}", ours)
            sub = 1
            if ds in cfg.attention_ds:
                for ck, ours in _attn_pairs(f"up_{i}_attn_{j}"):
                    yield (f"{base}.{sub}.{ck}", ours)
                sub += 1
            if i != 0 and j == cfg.num_res_blocks:
                yield (f"{base}.{sub}.conv.weight",
                       (f"up_{i}_upsample", "kernel"))
                yield (f"{base}.{sub}.conv.bias",
                       (f"up_{i}_upsample", "bias"))
            idx += 1
        if i != 0:
            ds //= 2

    yield ("out.0.weight", ("norm_out", "GroupNorm_0", "scale"))
    yield ("out.0.bias", ("norm_out", "GroupNorm_0", "bias"))
    yield ("out.2.weight", ("conv_out", "kernel"))
    yield ("out.2.bias", ("conv_out", "bias"))


def _to_flax(path: tuple, v: np.ndarray) -> np.ndarray:
    if path[-1] != "kernel":
        return v
    if v.ndim == 4:
        return v.transpose(2, 3, 1, 0)
    if v.ndim == 2:
        return v.T
    return v


def compvis_unet_to_flax(state_dict, cfg: SDUNetConfig = SDUNetConfig(),
                         prefix: str = "model.diffusion_model.") -> dict:
    """CompVis sd ckpt state dict -> our SDUNet params (strict over the
    mapped keys; unmapped CompVis keys are reported)."""
    sd = {}
    for k, val in state_dict.items():
        if k.startswith(prefix):
            sd[k[len(prefix):]] = val
    params: dict = {}
    used = set()
    for ck, path in sd_unet_key_map(cfg):
        if ck not in sd:
            if path[-2:] == ("skip", "kernel") or path[-2:] == ("skip", "bias"):
                continue  # skip_connection only exists on channel change
            raise KeyError(f"missing CompVis key {ck}")
        v = sd[ck]
        v = np.asarray(v.detach().cpu().numpy()
                       if hasattr(v, "detach") else v, np.float32)
        node = params
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = _to_flax(path, v)
        used.add(ck)
    leftover = set(sd) - used
    if leftover:
        import logging

        logging.getLogger("uurg.io").info(
            "unmapped CompVis keys (ok if aux heads): %s",
            sorted(leftover)[:8])
    return params


def flax_unet_to_compvis(params: dict,
                         cfg: SDUNetConfig = SDUNetConfig()) -> dict:
    """Inverse mapping for exporting back to CompVis format."""
    out = {}
    for ck, path in sd_unet_key_map(cfg):
        node = params
        ok = True
        for p in path:
            if not isinstance(node, dict) or p not in node:
                ok = False
                break
            node = node[p]
        if not ok:
            continue
        v = np.asarray(node, np.float32)
        if path[-1] == "kernel":
            v = v.transpose(3, 2, 0, 1) if v.ndim == 4 else v.T
        out[f"model.diffusion_model.{ck}"] = v
    return out
