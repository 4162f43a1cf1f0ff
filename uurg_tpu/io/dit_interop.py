"""DiT checkpoint interop: the public torch DiT-XL/2 checkpoints
(DiT/download.py find_model format — a dict with an 'ema'/'model' state
dict) -> our Flax DiT parameter tree.

Handles both block layouts: per-block subtrees (scan_blocks=False) and the
depth-stacked layout produced by nn.scan (scan_blocks=True, leading axis =
layer index). The fixed sin-cos pos_embed buffer is recomputed, not loaded.
"""
from __future__ import annotations

import numpy as np

from uurg_tpu.models.dit import DiTConfig


def _lin(w):
    return np.asarray(w, np.float32).T


def _t(v):
    return np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach")
                      else v, np.float32)


def torch_dit_state_to_flax(state_dict, cfg: DiTConfig) -> dict:
    """Map facebookresearch-DiT param names to our tree."""
    sd = {k: _t(v) for k, v in state_dict.items()}
    p: dict = {}

    p["patch_embed"] = {
        "kernel": sd["x_embedder.proj.weight"].transpose(2, 3, 1, 0),
        "bias": sd["x_embedder.proj.bias"],
    }
    p["t_mlp1"] = {"kernel": _lin(sd["t_embedder.mlp.0.weight"]),
                   "bias": sd["t_embedder.mlp.0.bias"]}
    p["t_mlp2"] = {"kernel": _lin(sd["t_embedder.mlp.2.weight"]),
                   "bias": sd["t_embedder.mlp.2.bias"]}
    p["y_embed"] = {"embedding": sd["y_embedder.embedding_table.weight"]}

    def block(i: int) -> dict:
        b = f"blocks.{i}."
        return {
            "adaLN_modulation": {
                "kernel": _lin(sd[b + "adaLN_modulation.1.weight"]),
                "bias": sd[b + "adaLN_modulation.1.bias"]},
            "attn": {
                "qkv": {"kernel": _lin(sd[b + "attn.qkv.weight"]),
                        "bias": sd[b + "attn.qkv.bias"]},
                "proj": {"kernel": _lin(sd[b + "attn.proj.weight"]),
                         "bias": sd[b + "attn.proj.bias"]},
            },
            "mlp_fc1": {"kernel": _lin(sd[b + "mlp.fc1.weight"]),
                        "bias": sd[b + "mlp.fc1.bias"]},
            "mlp_fc2": {"kernel": _lin(sd[b + "mlp.fc2.weight"]),
                        "bias": sd[b + "mlp.fc2.bias"]},
        }

    blocks = [block(i) for i in range(cfg.depth)]
    if cfg.scan_blocks:
        # stack along a new leading depth axis to match nn.scan params
        import jax

        p["blocks"] = jax.tree_util.tree_map(
            lambda *xs: np.stack(xs, axis=0), *blocks)
    else:
        for i, b in enumerate(blocks):
            p[f"block_{i}"] = b

    p["final_adaLN"] = {
        "kernel": _lin(sd["final_layer.adaLN_modulation.1.weight"]),
        "bias": sd["final_layer.adaLN_modulation.1.bias"]}
    p["final_linear"] = {"kernel": _lin(sd["final_layer.linear.weight"]),
                         "bias": sd["final_layer.linear.bias"]}
    return p


def load_dit_reference_checkpoint(path: str, cfg: DiTConfig,
                                  prefer_ema: bool = True) -> dict:
    """Load a torch DiT checkpoint file ({'model','ema','opt','args'} dict
    per DiT/forget.py:347-356, or a bare/EMA-keyed state dict per
    DiT/download.py:26-29)."""
    import torch

    ck = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(ck, dict) and ("ema" in ck or "model" in ck):
        sd = ck.get("ema" if prefer_ema and "ema" in ck else "model")
    else:
        sd = ck
    return torch_dit_state_to_flax(sd, cfg)
