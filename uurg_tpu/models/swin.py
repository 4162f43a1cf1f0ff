"""Swin Transformer classifiers (Flax / NHWC).

Parity target: Classification/models/swin.py:4-19 (torchvision Swin-T/S/B,
re-headed). Native implementation: 4x4 patch embed, window attention with
relative position bias, shifted windows via jnp.roll + attention mask, patch
merging between stages. Window reshapes are static; everything jits to a
single XLA program.
"""
from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


def window_partition(x: jnp.ndarray, w: int) -> jnp.ndarray:
    B, H, W, C = x.shape
    x = x.reshape(B, H // w, w, W // w, w, C)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, w * w, C)


def window_unpartition(xw: jnp.ndarray, w: int, H: int, W: int) -> jnp.ndarray:
    B = xw.shape[0] // (H // w * W // w)
    x = xw.reshape(B, H // w, W // w, w, w, -1)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(B, H, W, -1)


def relative_position_index(w: int) -> np.ndarray:
    coords = np.stack(np.meshgrid(np.arange(w), np.arange(w),
                                  indexing="ij")).reshape(2, -1)
    rel = coords[:, :, None] - coords[:, None, :]
    rel = rel.transpose(1, 2, 0) + (w - 1)
    return (rel[..., 0] * (2 * w - 1) + rel[..., 1]).astype(np.int32)


def shift_attn_mask(H: int, W: int, w: int, shift: int) -> np.ndarray:
    """Additive mask blocking attention across rolled-window boundaries."""
    img = np.zeros((1, H, W, 1))
    cnt = 0
    for hs in (slice(0, -w), slice(-w, -shift), slice(-shift, None)):
        for ws in (slice(0, -w), slice(-w, -shift), slice(-shift, None)):
            img[:, hs, ws, :] = cnt
            cnt += 1
    win = np.asarray(window_partition(jnp.asarray(img), w)).squeeze(-1)
    mask = win[:, None, :] - win[:, :, None]
    return np.where(mask != 0, -100.0, 0.0).astype(np.float32)


class WindowAttention(nn.Module):
    dim: int
    num_heads: int
    window: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, xw: jnp.ndarray, mask: jnp.ndarray | None):
        nW, T, C = xw.shape
        H = self.num_heads
        qkv = nn.Dense(3 * C, dtype=self.dtype, name="qkv")(xw)
        q, k, v = jnp.split(qkv.reshape(nW, T, 3, H, C // H), 3, axis=2)
        q, k, v = (z.squeeze(2).transpose(0, 2, 1, 3) for z in (q, k, v))
        attn = jnp.einsum("whqd,whkd->whqk", q, k,
                          preferred_element_type=jnp.float32)
        attn = attn * (C // H) ** -0.5

        bias_table = self.param(
            "rel_pos_bias", nn.initializers.normal(0.02),
            ((2 * self.window - 1) ** 2, H), jnp.float32)
        idx = relative_position_index(self.window)
        attn = attn + bias_table[idx].transpose(2, 0, 1)[None]
        if mask is not None:
            nM = mask.shape[0]
            attn = attn.reshape(nW // nM, nM, H, T, T) + mask[None, :, None]
            attn = attn.reshape(nW, H, T, T)
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("whqk,whkd->whqd", attn.astype(self.dtype), v,
                         preferred_element_type=jnp.float32)
        out = out.astype(self.dtype).transpose(0, 2, 1, 3).reshape(nW, T, C)
        return nn.Dense(C, dtype=self.dtype, name="proj")(out)


class SwinBlock(nn.Module):
    dim: int
    num_heads: int
    window: int
    shift: int
    mlp_ratio: float = 4.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray):
        B, H, W, C = x.shape
        w = min(self.window, H)
        shift = self.shift if w < H else 0

        h = nn.LayerNorm(dtype=jnp.float32, name="ln1")(x)
        if shift:
            h = jnp.roll(h, (-shift, -shift), axis=(1, 2))
            mask = jnp.asarray(shift_attn_mask(H, W, w, shift))
        else:
            mask = None
        hw = window_partition(h, w)
        hw = WindowAttention(C, self.num_heads, w, self.dtype,
                             name="attn")(hw, mask)
        h = window_unpartition(hw, w, H, W)
        if shift:
            h = jnp.roll(h, (shift, shift), axis=(1, 2))
        x = x + h

        h = nn.LayerNorm(dtype=jnp.float32, name="ln2")(x)
        h = nn.Dense(int(C * self.mlp_ratio), dtype=self.dtype, name="fc1")(h)
        # exact erf GELU to match torchvision Swin (io/tv_vit_swin_interop.py)
        h = jax.nn.gelu(h, approximate=False)
        h = nn.Dense(C, dtype=self.dtype, name="fc2")(h)
        return x + h


class PatchMerging(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray):
        B, H, W, C = x.shape
        x = x.reshape(B, H // 2, 2, W // 2, 2, C)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(B, H // 2, W // 2, 4 * C)
        x = nn.LayerNorm(dtype=jnp.float32, name="ln")(x)
        return nn.Dense(2 * C, use_bias=False, dtype=self.dtype,
                        name="reduction")(x)


@dataclasses.dataclass(frozen=True)
class SwinConfig:
    patch_size: int = 4
    embed_dim: int = 96
    depths: tuple = (2, 2, 6, 2)
    num_heads: tuple = (3, 6, 12, 24)
    window: int = 7
    num_classes: int = 10
    dtype: Any = jnp.float32


class Swin(nn.Module):
    cfg: SwinConfig

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = False):
        cfg = self.cfg
        p = cfg.patch_size
        h = nn.Conv(cfg.embed_dim, (p, p), strides=(p, p), dtype=cfg.dtype,
                    name="patch_embed")(x.astype(cfg.dtype))
        h = nn.LayerNorm(dtype=jnp.float32, name="ln_embed")(h)
        for i, (depth, heads) in enumerate(zip(cfg.depths, cfg.num_heads)):
            for j in range(depth):
                shift = 0 if j % 2 == 0 else cfg.window // 2
                h = SwinBlock(h.shape[-1], heads, cfg.window, shift,
                              dtype=cfg.dtype, name=f"stage{i}_block{j}")(h)
            if i < len(cfg.depths) - 1:
                h = PatchMerging(cfg.dtype, name=f"merge{i}")(h)
        h = nn.LayerNorm(dtype=jnp.float32, name="ln_final")(h)
        h = h.mean(axis=(1, 2))
        return nn.Dense(cfg.num_classes, dtype=jnp.float32, name="head")(
            h.astype(jnp.float32))


def Swin_T(num_classes=10, dtype=jnp.float32):
    return Swin(SwinConfig(num_classes=num_classes, dtype=dtype))


def Swin_S(num_classes=10, dtype=jnp.float32):
    return Swin(SwinConfig(depths=(2, 2, 18, 2), num_classes=num_classes,
                           dtype=dtype))


def Swin_B(num_classes=10, dtype=jnp.float32):
    return Swin(SwinConfig(embed_dim=128, depths=(2, 2, 18, 2),
                           num_heads=(4, 8, 16, 32),
                           num_classes=num_classes, dtype=dtype))
