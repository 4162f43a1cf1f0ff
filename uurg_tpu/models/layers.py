"""Shared neural-net building blocks (Flax, NHWC, TPU-friendly dtypes).

Compute runs in a configurable dtype (bfloat16 on TPU for MXU throughput);
parameters and normalization statistics stay float32.
"""
from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


def timestep_embedding(t: jnp.ndarray, dim: int,
                       max_period: float = 10000.0) -> jnp.ndarray:
    """Sinusoidal timestep embedding, tensor2tensor convention
    (parity: DDPM/models/diffusion.py:17-35 — [sin | cos] concat, odd dims
    zero-padded)."""
    half = dim // 2
    freqs = jnp.exp(
        -math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / (half - 1)
    )
    args = t.astype(jnp.float32)[:, None] * freqs[None, :]
    emb = jnp.concatenate([jnp.sin(args), jnp.cos(args)], axis=-1)
    if dim % 2 == 1:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    return emb


def swish(x: jnp.ndarray) -> jnp.ndarray:
    return x * jax.nn.sigmoid(x)


class _FusedGN(nn.Module):
    """Param-holding shim around ops.group_norm — named ``GroupNorm_0`` by
    the parent so the parameter tree is byte-identical to the previous
    flax nn.GroupNorm child (checkpoints/interop key maps unchanged)."""

    groups: int
    epsilon: float

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        from uurg_tpu.ops.group_norm import group_norm

        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        return group_norm(x, scale, bias, groups=self.groups,
                          eps=self.epsilon)


class GroupNorm32(nn.Module):
    """GroupNorm(32, eps=1e-6); statistics in float32, output in the input
    dtype. On TPU the one-pass Pallas kernel (ops/group_norm.py) runs when
    the channel count is lane-aligned; elsewhere the reference XLA
    formulation (flax-equivalent) applies."""

    num_groups: int = 32
    epsilon: float = 1e-6

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        channels = x.shape[-1]
        groups = self.num_groups
        while channels % groups != 0:  # tiny test configs (<32 channels)
            groups //= 2
        return _FusedGN(groups, self.epsilon, name="GroupNorm_0")(x)


class SelfAttention2D(nn.Module):
    """Single-head spatial self-attention over H*W positions.

    Parity: DDPM/models/diffusion.py:148-192 (1x1 q/k/v projections,
    1/sqrt(C) scaling, residual). Runs through the fused Pallas attention
    (fp32 softmax in VMEM) where T is 128-aligned; XLA einsums elsewhere.
    """

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        B, H, W, C = x.shape
        h = GroupNorm32(name="norm")(x)
        q = nn.Dense(C, dtype=self.dtype, name="q")(h).reshape(B, H * W, C)
        k = nn.Dense(C, dtype=self.dtype, name="k")(h).reshape(B, H * W, C)
        v = nn.Dense(C, dtype=self.dtype, name="v")(h).reshape(B, H * W, C)
        # single head -> (B, 1, T, C). On TPU with T % 128 == 0 (the 16x16
        # sites: T=256) this runs the fused Pallas kernel — the fp32
        # (T x T) score/prob matrices stay in VMEM instead of being
        # written to HBM between fwd and bwd; the 4x4 mid site (T=16)
        # falls back to the einsum path inside the dispatcher.
        from uurg_tpu.ops.flash_attention import attention

        out = attention(q[:, None], k[:, None], v[:, None])[:, 0]
        out = out.astype(self.dtype).reshape(B, H, W, C)
        out = nn.Dense(C, dtype=self.dtype, name="proj_out")(out)
        return x + out


class ResnetBlockDDPM(nn.Module):
    """DDPM residual block conditioned on [time-emb | class-emb].

    Parity: DDPM/models/diffusion.py:85-145 — a single Linear projects the
    concatenated (temb, cemb) through swish and is added channelwise.
    """

    out_channels: int
    dropout: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, emb: jnp.ndarray,
                 deterministic: bool = True) -> jnp.ndarray:
        # (positional-friendly ``deterministic`` so nn.remat can mark it
        # static by argnum)
        in_ch = x.shape[-1]
        h = swish(GroupNorm32(name="norm1")(x))
        h = nn.Conv(self.out_channels, (3, 3), dtype=self.dtype, name="conv1")(h)
        emb_out = nn.Dense(self.out_channels, dtype=self.dtype,
                           name="emb_proj")(swish(emb))
        h = h + emb_out[:, None, None, :]
        h = swish(GroupNorm32(name="norm2")(h))
        h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        h = nn.Conv(self.out_channels, (3, 3), dtype=self.dtype, name="conv2")(h)
        if in_ch != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                        name="shortcut")(x)
        return x + h


class Downsample(nn.Module):
    """Stride-2 conv with (0,1) asymmetric padding, or 2x2 avg-pool
    (parity: DDPM/models/diffusion.py:65-82)."""

    with_conv: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.with_conv:
            return nn.Conv(
                x.shape[-1], (3, 3), strides=(2, 2),
                padding=((0, 1), (0, 1)), dtype=self.dtype, name="conv",
            )(x)
        return nn.avg_pool(x, (2, 2), strides=(2, 2))


class Upsample(nn.Module):
    """Nearest-neighbor 2x upsample + conv
    (parity: DDPM/models/diffusion.py:49-62)."""

    with_conv: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        B, H, W, C = x.shape
        x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
        if self.with_conv:
            x = nn.Conv(C, (3, 3), dtype=self.dtype, name="conv")(x)
        return x
