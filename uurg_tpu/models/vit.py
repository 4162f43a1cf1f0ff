"""ViT classifiers (Flax / NHWC).

Parity target: Classification/models/vit.py:4-7 (torchvision ViT-B/16 with a
re-initialized head). Built natively: patchify conv, learnable pos-emb +
class token, pre-LN transformer encoder, GELU MLP. The reference loads
torchvision IMAGENET1K weights; here weights come from a checkpoint (see
uurg_tpu.io) since the environment has no download path.
"""
from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from uurg_tpu.models.dit import MHSA


@dataclasses.dataclass(frozen=True)
class ViTConfig:
    image_size: int = 224
    patch_size: int = 16
    hidden_size: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    num_classes: int = 10
    dropout: float = 0.0
    dtype: Any = jnp.float32


class ViTBlock(nn.Module):
    hidden: int
    num_heads: int
    mlp_ratio: float
    dropout: float
    dtype: Any

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        h = nn.LayerNorm(dtype=jnp.float32, name="ln1")(x)
        x = x + MHSA(self.num_heads, self.dtype, name="attn")(h)
        h = nn.LayerNorm(dtype=jnp.float32, name="ln2")(x)
        h = nn.Dense(int(self.hidden * self.mlp_ratio), dtype=self.dtype,
                     name="fc1")(h)
        # exact erf GELU: torchvision's encoder uses nn.GELU() (erf form),
        # and checkpoint interop (io/tv_vit_swin_interop.py) is bit-faithful
        # only if activations match
        h = jax.nn.gelu(h, approximate=False)
        h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        h = nn.Dense(self.hidden, dtype=self.dtype, name="fc2")(h)
        return x + h


class ViT(nn.Module):
    cfg: ViTConfig

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        cfg = self.cfg
        B = x.shape[0]
        p = cfg.patch_size
        h = nn.Conv(cfg.hidden_size, (p, p), strides=(p, p), dtype=cfg.dtype,
                    name="patch_embed")(x.astype(cfg.dtype))
        T = (x.shape[1] // p) * (x.shape[2] // p)
        h = h.reshape(B, T, cfg.hidden_size)
        cls_tok = self.param("cls_token", nn.initializers.zeros,
                             (1, 1, cfg.hidden_size), jnp.float32)
        h = jnp.concatenate(
            [jnp.broadcast_to(cls_tok.astype(h.dtype), (B, 1, cfg.hidden_size)),
             h], axis=1)
        pos = self.param("pos_embed", nn.initializers.normal(0.02),
                         (1, T + 1, cfg.hidden_size), jnp.float32)
        h = h + pos.astype(h.dtype)
        for i in range(cfg.depth):
            h = ViTBlock(cfg.hidden_size, cfg.num_heads, cfg.mlp_ratio,
                         cfg.dropout, cfg.dtype, name=f"block_{i}")(
                h, deterministic=not train)
        h = nn.LayerNorm(dtype=jnp.float32, name="ln_final")(h)
        return nn.Dense(cfg.num_classes, dtype=jnp.float32, name="head")(
            h[:, 0].astype(jnp.float32))


def ViT_B(num_classes=10, image_size=224, dtype=jnp.float32):
    return ViT(ViTConfig(image_size=image_size, num_classes=num_classes,
                         dtype=dtype))
