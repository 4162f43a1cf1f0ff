"""AutoencoderKL (the SD / SD-VAE first stage) in Flax — NHWC.

Parity target: SD/ldm/models/autoencoder.py:339-530 +
ldm/modules/diffusionmodules/model.py (Encoder/Decoder), also used frozen by
the DiT workload (diffusers sd-vae-ft-ema, DiT/forget.py:195). Encoder emits
8-channel moments -> DiagonalGaussian; latents scale by 0.18215.
"""
from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from uurg_tpu.models.layers import GroupNorm32, SelfAttention2D


def silu(x):
    return x * jax.nn.sigmoid(x)


class VAEResBlock(nn.Module):
    out_channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = silu(GroupNorm32(name="norm1")(x))
        h = nn.Conv(self.out_channels, (3, 3), dtype=self.dtype, name="conv1")(h)
        h = silu(GroupNorm32(name="norm2")(h))
        h = nn.Conv(self.out_channels, (3, 3), dtype=self.dtype, name="conv2")(h)
        if x.shape[-1] != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                        name="shortcut")(x)
        return x + h


@dataclasses.dataclass(frozen=True)
class VAEConfig:
    in_channels: int = 3
    latent_channels: int = 4
    base_channels: int = 128
    channel_mult: tuple = (1, 2, 4, 4)
    num_res_blocks: int = 2
    scale_factor: float = 0.18215
    dtype: Any = jnp.float32


class Encoder(nn.Module):
    cfg: VAEConfig

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        h = nn.Conv(cfg.base_channels, (3, 3), dtype=cfg.dtype,
                    name="conv_in")(x.astype(cfg.dtype))
        for i, mult in enumerate(cfg.channel_mult):
            for j in range(cfg.num_res_blocks):
                h = VAEResBlock(cfg.base_channels * mult, cfg.dtype,
                                name=f"down_{i}_res_{j}")(h)
            if i != len(cfg.channel_mult) - 1:
                h = nn.Conv(h.shape[-1], (3, 3), (2, 2),
                            padding=((0, 1), (0, 1)), dtype=cfg.dtype,
                            name=f"down_{i}_downsample")(h)
        h = VAEResBlock(h.shape[-1], cfg.dtype, name="mid_res_1")(h)
        h = SelfAttention2D(cfg.dtype, name="mid_attn")(h)
        h = VAEResBlock(h.shape[-1], cfg.dtype, name="mid_res_2")(h)
        h = silu(GroupNorm32(name="norm_out")(h))
        return nn.Conv(2 * cfg.latent_channels, (3, 3), dtype=jnp.float32,
                       name="conv_out")(h.astype(jnp.float32))


class Decoder(nn.Module):
    cfg: VAEConfig

    @nn.compact
    def __call__(self, z):
        cfg = self.cfg
        ch_top = cfg.base_channels * cfg.channel_mult[-1]
        h = nn.Conv(ch_top, (3, 3), dtype=cfg.dtype, name="conv_in")(
            z.astype(cfg.dtype))
        h = VAEResBlock(ch_top, cfg.dtype, name="mid_res_1")(h)
        h = SelfAttention2D(cfg.dtype, name="mid_attn")(h)
        h = VAEResBlock(ch_top, cfg.dtype, name="mid_res_2")(h)
        for i in reversed(range(len(cfg.channel_mult))):
            for j in range(cfg.num_res_blocks + 1):
                h = VAEResBlock(cfg.base_channels * cfg.channel_mult[i],
                                cfg.dtype, name=f"up_{i}_res_{j}")(h)
            if i != 0:
                B, H, W, C = h.shape
                h = jnp.repeat(jnp.repeat(h, 2, axis=1), 2, axis=2)
                h = nn.Conv(C, (3, 3), dtype=cfg.dtype,
                            name=f"up_{i}_upsample")(h)
        h = silu(GroupNorm32(name="norm_out")(h))
        return nn.Conv(cfg.in_channels, (3, 3), dtype=jnp.float32,
                       name="conv_out")(h.astype(jnp.float32))


class AutoencoderKL(nn.Module):
    cfg: VAEConfig

    def setup(self):
        self.encoder = Encoder(self.cfg)
        self.decoder = Decoder(self.cfg)
        # 1x1 convs around the latent (quant_conv / post_quant_conv)
        self.quant_conv = nn.Conv(2 * self.cfg.latent_channels, (1, 1),
                                  name="quant_conv")
        self.post_quant_conv = nn.Conv(self.cfg.latent_channels, (1, 1),
                                       name="post_quant_conv")

    def encode_moments(self, x):
        return self.quant_conv(self.encoder(x))

    def encode(self, x, key=None):
        """Sample (or take the mean of) the posterior, scaled for diffusion."""
        moments = self.encode_moments(x)
        mean, logvar = jnp.split(moments, 2, axis=-1)
        logvar = jnp.clip(logvar, -30.0, 20.0)
        if key is not None:
            z = mean + jnp.exp(0.5 * logvar) * jax.random.normal(
                key, mean.shape, mean.dtype)
        else:
            z = mean
        return z * self.cfg.scale_factor

    def decode(self, z):
        return self.decoder(self.post_quant_conv(z / self.cfg.scale_factor))

    def __call__(self, x, key=None):
        z = self.encode(x, key)
        return self.decode(z)


def init_vae(key, cfg: VAEConfig | None = None, resolution: int = 32):
    cfg = cfg or VAEConfig()
    model = AutoencoderKL(cfg)
    x = jnp.zeros((1, resolution, resolution, cfg.in_channels))
    params = jax.jit(lambda k, xx: model.init(k, xx))(
        {"params": key}, x)["params"]
    return model, params
