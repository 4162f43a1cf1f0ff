"""VAE (CompVis first-stage) and CLIP text-encoder checkpoint interop.

Together with sd_interop.py (UNet) this covers the live conversion surface
of the reference's convertModels.py: a CompVis sd-v1-*.ckpt fully loads into
our Flax stack (UNet + AutoencoderKL + CLIPTextEncoder).

CompVis first_stage_model naming: encoder/decoder with down.{i}.block.{j}
(norm1/conv1/norm2/conv2/nin_shortcut), downsample.conv, mid.block_1/
attn_1/block_2, norm_out, conv_out, quant_conv, post_quant_conv
(SD/ldm/models/autoencoder.py + modules/diffusionmodules/model.py).

CLIP (HF transformers) naming: text_model.embeddings.{token,position}_
embedding, encoder.layers.N.{self_attn.*_proj, layer_norm1/2, mlp.fc1/fc2},
final_layer_norm (SD/ldm/modules/encoders/modules.py FrozenCLIPEmbedder).
"""
from __future__ import annotations

import numpy as np

from uurg_tpu.models.autoencoder_kl import VAEConfig
from uurg_tpu.models.clip_text import CLIPTextConfig


def _t(v):
    return np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach")
                      else v, np.float32)


def _conv(v):
    return _t(v).transpose(2, 3, 1, 0)


def _attn1x1(v):
    v = _t(v)
    return v[:, :, 0, 0].T if v.ndim == 4 else v.T


def _set(tree, path, value):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def _resblock(sd, src: str, dst: tuple, out: dict):
    _set(out, (*dst, "norm1", "GroupNorm_0", "scale"), _t(sd[f"{src}.norm1.weight"]))
    _set(out, (*dst, "norm1", "GroupNorm_0", "bias"), _t(sd[f"{src}.norm1.bias"]))
    _set(out, (*dst, "conv1", "kernel"), _conv(sd[f"{src}.conv1.weight"]))
    _set(out, (*dst, "conv1", "bias"), _t(sd[f"{src}.conv1.bias"]))
    _set(out, (*dst, "norm2", "GroupNorm_0", "scale"), _t(sd[f"{src}.norm2.weight"]))
    _set(out, (*dst, "norm2", "GroupNorm_0", "bias"), _t(sd[f"{src}.norm2.bias"]))
    _set(out, (*dst, "conv2", "kernel"), _conv(sd[f"{src}.conv2.weight"]))
    _set(out, (*dst, "conv2", "bias"), _t(sd[f"{src}.conv2.bias"]))
    if f"{src}.nin_shortcut.weight" in sd:
        _set(out, (*dst, "shortcut", "kernel"),
             _conv(sd[f"{src}.nin_shortcut.weight"]))
        _set(out, (*dst, "shortcut", "bias"), _t(sd[f"{src}.nin_shortcut.bias"]))


def _attnblock(sd, src: str, dst: tuple, out: dict):
    _set(out, (*dst, "norm", "GroupNorm_0", "scale"), _t(sd[f"{src}.norm.weight"]))
    _set(out, (*dst, "norm", "GroupNorm_0", "bias"), _t(sd[f"{src}.norm.bias"]))
    for n in ("q", "k", "v", "proj_out"):
        _set(out, (*dst, n, "kernel"), _attn1x1(sd[f"{src}.{n}.weight"]))
        _set(out, (*dst, n, "bias"), _t(sd[f"{src}.{n}.bias"]))


def compvis_vae_to_flax(state_dict, cfg: VAEConfig = VAEConfig(),
                        prefix: str = "first_stage_model.") -> dict:
    sd = {k[len(prefix):]: v for k, v in state_dict.items()
          if k.startswith(prefix)}
    out: dict = {}
    n = len(cfg.channel_mult)

    for side in ("encoder", "decoder"):
        _set(out, (side, "conv_in", "kernel"), _conv(sd[f"{side}.conv_in.weight"]))
        _set(out, (side, "conv_in", "bias"), _t(sd[f"{side}.conv_in.bias"]))
        _resblock(sd, f"{side}.mid.block_1", (side, "mid_res_1"), out)
        _attnblock(sd, f"{side}.mid.attn_1", (side, "mid_attn"), out)
        _resblock(sd, f"{side}.mid.block_2", (side, "mid_res_2"), out)
        _set(out, (side, "norm_out", "GroupNorm_0", "scale"),
             _t(sd[f"{side}.norm_out.weight"]))
        _set(out, (side, "norm_out", "GroupNorm_0", "bias"),
             _t(sd[f"{side}.norm_out.bias"]))
        _set(out, (side, "conv_out", "kernel"), _conv(sd[f"{side}.conv_out.weight"]))
        _set(out, (side, "conv_out", "bias"), _t(sd[f"{side}.conv_out.bias"]))

    for i in range(n):
        for j in range(cfg.num_res_blocks):
            _resblock(sd, f"encoder.down.{i}.block.{j}",
                      ("encoder", f"down_{i}_res_{j}"), out)
        if i != n - 1:
            _set(out, ("encoder", f"down_{i}_downsample", "kernel"),
                 _conv(sd[f"encoder.down.{i}.downsample.conv.weight"]))
            _set(out, ("encoder", f"down_{i}_downsample", "bias"),
                 _t(sd[f"encoder.down.{i}.downsample.conv.bias"]))
        for j in range(cfg.num_res_blocks + 1):
            _resblock(sd, f"decoder.up.{i}.block.{j}",
                      ("decoder", f"up_{i}_res_{j}"), out)
        if i != 0:
            _set(out, ("decoder", f"up_{i}_upsample", "kernel"),
                 _conv(sd[f"decoder.up.{i}.upsample.conv.weight"]))
            _set(out, ("decoder", f"up_{i}_upsample", "bias"),
                 _t(sd[f"decoder.up.{i}.upsample.conv.bias"]))

    _set(out, ("quant_conv", "kernel"), _conv(sd["quant_conv.weight"]))
    _set(out, ("quant_conv", "bias"), _t(sd["quant_conv.bias"]))
    _set(out, ("post_quant_conv", "kernel"), _conv(sd["post_quant_conv.weight"]))
    _set(out, ("post_quant_conv", "bias"), _t(sd["post_quant_conv.bias"]))
    return out


def hf_clip_text_to_flax(state_dict, cfg: CLIPTextConfig = CLIPTextConfig(),
                         prefix: str = "text_model.") -> dict:
    sd = {k[len(prefix):] if k.startswith(prefix) else k: v
          for k, v in state_dict.items()}
    out: dict = {}
    _set(out, ("token_embed", "embedding"),
         _t(sd["embeddings.token_embedding.weight"]))
    out["pos_embed"] = _t(sd["embeddings.position_embedding.weight"])
    for i in range(cfg.depth):
        b = f"encoder.layers.{i}."
        qkv_w = np.concatenate([
            _t(sd[b + f"self_attn.{n}_proj.weight"]).T for n in ("q", "k", "v")
        ], axis=1)
        qkv_b = np.concatenate([
            _t(sd[b + f"self_attn.{n}_proj.bias"]) for n in ("q", "k", "v")])
        _set(out, (f"attn_{i}", "qkv", "kernel"), qkv_w)
        _set(out, (f"attn_{i}", "qkv", "bias"), qkv_b)
        _set(out, (f"attn_{i}", "proj", "kernel"),
             _t(sd[b + "self_attn.out_proj.weight"]).T)
        _set(out, (f"attn_{i}", "proj", "bias"),
             _t(sd[b + "self_attn.out_proj.bias"]))
        for src, dst in (("layer_norm1", f"ln1_{i}"),
                         ("layer_norm2", f"ln2_{i}")):
            _set(out, (dst, "scale"), _t(sd[b + src + ".weight"]))
            _set(out, (dst, "bias"), _t(sd[b + src + ".bias"]))
        for src, dst in (("mlp.fc1", f"fc1_{i}"), ("mlp.fc2", f"fc2_{i}")):
            _set(out, (dst, "kernel"), _t(sd[b + src + ".weight"]).T)
            _set(out, (dst, "bias"), _t(sd[b + src + ".bias"]))
    _set(out, ("ln_final", "scale"), _t(sd["final_layer_norm.weight"]))
    _set(out, ("ln_final", "bias"), _t(sd["final_layer_norm.bias"]))
    return out


def load_compvis_sd_checkpoint(path: str, unet_cfg=None, vae_cfg=None,
                               text_cfg=None) -> dict:
    """Full sd-v1-*.ckpt -> {"unet", "vae", "text"} Flax param trees."""
    import torch

    from uurg_tpu.io.sd_interop import compvis_unet_to_flax
    from uurg_tpu.models.sd_unet import SDUNetConfig

    ck = torch.load(path, map_location="cpu", weights_only=False)
    sd = ck.get("state_dict", ck)
    clip_sd = {k[len("cond_stage_model.transformer."):]: v
               for k, v in sd.items()
               if k.startswith("cond_stage_model.transformer.")}
    return {
        "unet": compvis_unet_to_flax(sd, unet_cfg or SDUNetConfig()),
        "vae": compvis_vae_to_flax(sd, vae_cfg or VAEConfig()),
        "text": hf_clip_text_to_flax(clip_sd, text_cfg or CLIPTextConfig()),
    }
