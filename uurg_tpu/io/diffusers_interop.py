"""Diffusers-format export for the SD UNet.

The reference saves every erasure checkpoint in BOTH CompVis and Diffusers
layouts (SD/train-scripts/nsfw_removal.py:217-244 via
convertModels.savemodelDiffusers). ``flax_unet_to_diffusers`` emits the
UNet2DConditionModel state-dict layout so erased models drop into any
diffusers pipeline.

Layout notes (diffusers sd-v1 UNet):
- down_blocks.{i}.resnets.{j}. / .attentions.{j}. ; downsamplers.0.conv
- mid_block.resnets.{0,1} / mid_block.attentions.0
- up_blocks.{k}.resnets.{j} / .attentions.{j} ; upsamplers.0.conv
  (up_blocks index k counts DOWN from the deepest level: k = n_levels-1-i)
- time_embedding.linear_{1,2}, conv_in, conv_norm_out, conv_out
"""
from __future__ import annotations

import numpy as np

from uurg_tpu.models.sd_unet import SDUNetConfig


def _get(params: dict, path: tuple):
    node = params
    for p in path:
        if not isinstance(node, dict) or p not in node:
            return None
        node = node[p]
    return node


def _conv_out(v):
    return np.asarray(v, np.float32).transpose(3, 2, 0, 1)


def _lin_out(v):
    return np.asarray(v, np.float32).T


def _emit_resnet(params, ours: str, dest: str, out: dict):
    pairs = [
        (("norm1", "GroupNorm_0", "scale"), f"{dest}.norm1.weight", None),
        (("norm1", "GroupNorm_0", "bias"), f"{dest}.norm1.bias", None),
        (("conv1", "kernel"), f"{dest}.conv1.weight", _conv_out),
        (("conv1", "bias"), f"{dest}.conv1.bias", None),
        (("emb_proj", "kernel"), f"{dest}.time_emb_proj.weight", _lin_out),
        (("emb_proj", "bias"), f"{dest}.time_emb_proj.bias", None),
        (("norm2", "GroupNorm_0", "scale"), f"{dest}.norm2.weight", None),
        (("norm2", "GroupNorm_0", "bias"), f"{dest}.norm2.bias", None),
        (("conv2", "kernel"), f"{dest}.conv2.weight", _conv_out),
        (("conv2", "bias"), f"{dest}.conv2.bias", None),
        (("skip", "kernel"), f"{dest}.conv_shortcut.weight", _conv_out),
        (("skip", "bias"), f"{dest}.conv_shortcut.bias", None),
    ]
    for path, key, conv in pairs:
        v = _get(params, (ours, *path))
        if v is None:
            continue
        out[key] = conv(v) if conv else np.asarray(v, np.float32)


def _emit_attn(params, ours: str, dest: str, out: dict):
    out[f"{dest}.norm.weight"] = np.asarray(
        _get(params, (ours, "norm", "GroupNorm_0", "scale")), np.float32)
    out[f"{dest}.norm.bias"] = np.asarray(
        _get(params, (ours, "norm", "GroupNorm_0", "bias")), np.float32)
    for n in ("proj_in", "proj_out"):
        out[f"{dest}.{n}.weight"] = _conv_out(_get(params, (ours, n, "kernel")))
        out[f"{dest}.{n}.bias"] = np.asarray(
            _get(params, (ours, n, "bias")), np.float32)
    tb = (ours, "tblock_0")
    d = f"{dest}.transformer_blocks.0"
    for attn in ("attn1", "attn2"):
        for qkv in ("to_q", "to_k", "to_v"):
            out[f"{d}.{attn}.{qkv}.weight"] = _lin_out(
                _get(params, (*tb, attn, qkv, "kernel")))
        out[f"{d}.{attn}.to_out.0.weight"] = _lin_out(
            _get(params, (*tb, attn, "to_out", "kernel")))
        out[f"{d}.{attn}.to_out.0.bias"] = np.asarray(
            _get(params, (*tb, attn, "to_out", "bias")), np.float32)
    for i, norm in enumerate(("norm1", "norm2", "norm3"), 1):
        out[f"{d}.{norm}.weight"] = np.asarray(
            _get(params, (*tb, norm, "scale")), np.float32)
        out[f"{d}.{norm}.bias"] = np.asarray(
            _get(params, (*tb, norm, "bias")), np.float32)
    out[f"{d}.ff.net.0.proj.weight"] = _lin_out(
        _get(params, (*tb, "ff_geglu", "proj", "kernel")))
    out[f"{d}.ff.net.0.proj.bias"] = np.asarray(
        _get(params, (*tb, "ff_geglu", "proj", "bias")), np.float32)
    out[f"{d}.ff.net.2.weight"] = _lin_out(
        _get(params, (*tb, "ff_out", "kernel")))
    out[f"{d}.ff.net.2.bias"] = np.asarray(
        _get(params, (*tb, "ff_out", "bias")), np.float32)


def flax_unet_to_diffusers(params: dict,
                           cfg: SDUNetConfig = SDUNetConfig()) -> dict:
    out: dict = {}
    out["time_embedding.linear_1.weight"] = _lin_out(
        params["time_embed_0"]["kernel"])
    out["time_embedding.linear_1.bias"] = np.asarray(
        params["time_embed_0"]["bias"], np.float32)
    out["time_embedding.linear_2.weight"] = _lin_out(
        params["time_embed_2"]["kernel"])
    out["time_embedding.linear_2.bias"] = np.asarray(
        params["time_embed_2"]["bias"], np.float32)
    out["conv_in.weight"] = _conv_out(params["conv_in"]["kernel"])
    out["conv_in.bias"] = np.asarray(params["conv_in"]["bias"], np.float32)

    n = len(cfg.channel_mult)
    ds = 1
    for i in range(n):
        for j in range(cfg.num_res_blocks):
            _emit_resnet(params, f"down_{i}_res_{j}",
                         f"down_blocks.{i}.resnets.{j}", out)
            if ds in cfg.attention_ds:
                _emit_attn(params, f"down_{i}_attn_{j}",
                           f"down_blocks.{i}.attentions.{j}", out)
        if i != n - 1:
            out[f"down_blocks.{i}.downsamplers.0.conv.weight"] = _conv_out(
                params[f"down_{i}_downsample"]["kernel"])
            out[f"down_blocks.{i}.downsamplers.0.conv.bias"] = np.asarray(
                params[f"down_{i}_downsample"]["bias"], np.float32)
            ds *= 2

    _emit_resnet(params, "mid_res_1", "mid_block.resnets.0", out)
    _emit_attn(params, "mid_attn", "mid_block.attentions.0", out)
    _emit_resnet(params, "mid_res_2", "mid_block.resnets.1", out)

    for i in reversed(range(n)):
        k = n - 1 - i  # diffusers up_blocks count from the deepest level
        for j in range(cfg.num_res_blocks + 1):
            _emit_resnet(params, f"up_{i}_res_{j}",
                         f"up_blocks.{k}.resnets.{j}", out)
            if ds in cfg.attention_ds:
                _emit_attn(params, f"up_{i}_attn_{j}",
                           f"up_blocks.{k}.attentions.{j}", out)
        if i != 0:
            out[f"up_blocks.{k}.upsamplers.0.conv.weight"] = _conv_out(
                params[f"up_{i}_upsample"]["kernel"])
            out[f"up_blocks.{k}.upsamplers.0.conv.bias"] = np.asarray(
                params[f"up_{i}_upsample"]["bias"], np.float32)
            ds //= 2

    out["conv_norm_out.weight"] = np.asarray(
        params["norm_out"]["GroupNorm_0"]["scale"], np.float32)
    out["conv_norm_out.bias"] = np.asarray(
        params["norm_out"]["GroupNorm_0"]["bias"], np.float32)
    out["conv_out.weight"] = _conv_out(params["conv_out"]["kernel"])
    out["conv_out.bias"] = np.asarray(params["conv_out"]["bias"], np.float32)
    return out
