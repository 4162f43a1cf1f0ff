"""Class-conditional DDPM UNet (Flax / NHWC).

TPU-native re-design of the reference conditional UNet
(DDPM/models/diffusion.py:195-413, 35.7M params at ch=128). Differences by
design, not accident:

- NHWC layout (TPU conv-native) instead of NCHW.
- Conditioning dropout takes an explicit boolean keep-mask (pure function;
  the torch version draws from global RNG inside forward).
- Classifier-free guidance is NOT a method on the model: samplers wrap the
  apply function with a batched double-forward
  (`uurg_tpu.diffusion.sampling.cfg_model_fn`), keeping the MXU busy with
  one 2N-batch call instead of two N-batch calls.
- Compute dtype configurable (bfloat16 by default on TPU); params fp32.
"""
from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from uurg_tpu.models.layers import (
    Downsample,
    GroupNorm32,
    ResnetBlockDDPM,
    SelfAttention2D,
    Upsample,
    swish,
    timestep_embedding,
)


@dataclasses.dataclass(frozen=True)
class UNetConfig:
    in_channels: int = 3
    out_channels: int = 3
    ch: int = 128
    ch_mult: tuple = (1, 2, 2, 2)
    num_res_blocks: int = 2
    attn_resolutions: tuple = (16,)
    dropout: float = 0.1
    resamp_with_conv: bool = True
    resolution: int = 32
    n_classes: int = 10
    cond_drop_prob: float = 0.1
    dtype: Any = jnp.bfloat16
    # rematerialize res blocks in the backward pass: trades extra conv FLOPs
    # (MXU has headroom — bench ~47% util) for activation HBM traffic (the
    # measured bottleneck); forward-only use is unaffected
    remat: bool = False

    @classmethod
    def from_config(cls, cfg, dtype=jnp.bfloat16,
                    remat: bool | None = None) -> "UNetConfig":
        """Build from a reference-schema YAML config (model/data sections).
        ``remat`` falls back to ``model.remat`` in the YAML (default off)."""
        if remat is None:
            remat = bool(cfg.model.get("remat", False))
        return cls(
            remat=remat,
            in_channels=cfg.model.in_channels,
            out_channels=cfg.model.out_ch,
            ch=cfg.model.ch,
            ch_mult=tuple(cfg.model.ch_mult),
            num_res_blocks=cfg.model.num_res_blocks,
            attn_resolutions=tuple(cfg.model.attn_resolutions),
            dropout=cfg.model.dropout,
            resamp_with_conv=cfg.model.resamp_with_conv,
            resolution=cfg.data.image_size,
            n_classes=cfg.data.n_classes,
            cond_drop_prob=cfg.model.get("cond_drop_prob", 0.1),
            dtype=dtype,
        )


class CondUNet(nn.Module):
    """eps-prediction UNet conditioned on timestep + class label.

    Call: ``model.apply(vars, x, t, c, cond_keep, train=...)`` where
    ``cond_keep`` is a per-sample bool mask — False selects the learned null
    class embedding (classifier-free guidance dropout).
    """

    cfg: UNetConfig

    @nn.compact
    def __call__(self, x: jnp.ndarray, t: jnp.ndarray, c: jnp.ndarray,
                 cond_keep: jnp.ndarray | None = None, *,
                 train: bool = False) -> jnp.ndarray:
        cfg = self.cfg
        ch, dtype = cfg.ch, cfg.dtype
        emb_ch = ch * 4
        num_res = len(cfg.ch_mult)
        x = x.astype(dtype)

        # timestep embedding -> MLP (ch -> 4ch -> 4ch)
        temb = timestep_embedding(t, ch)
        temb = nn.Dense(emb_ch, dtype=dtype, name="temb_dense0")(temb.astype(dtype))
        temb = nn.Dense(emb_ch, dtype=dtype, name="temb_dense1")(swish(temb))

        # class embedding with null-class token for CFG dropout
        cemb_table = nn.Embed(cfg.n_classes, ch, name="classes_emb",
                              param_dtype=jnp.float32)
        cemb = cemb_table(c)
        null_emb = self.param("null_classes_emb",
                              nn.initializers.normal(1.0), (ch,), jnp.float32)
        if cond_keep is not None:
            cemb = jnp.where(cond_keep[:, None], cemb,
                             null_emb[None, :].astype(cemb.dtype))
        cemb = nn.Dense(emb_ch, dtype=dtype, name="cemb_dense0")(cemb.astype(dtype))
        cemb = nn.Dense(emb_ch, dtype=dtype, name="cemb_dense1")(swish(cemb))

        # The reference concatenates [temb, cemb] and projects per-block
        # (DDPM/models/diffusion.py:131-132); equivalent here.
        emb = jnp.concatenate([temb, cemb], axis=-1)

        det = not train
        # static_argnums counts the module instance as arg 0, so
        # ``deterministic`` (x=1, emb=2) is arg 3
        Block = (nn.remat(ResnetBlockDDPM, static_argnums=(3,))
                 if cfg.remat else ResnetBlockDDPM)

        # downsampling
        hs = [nn.Conv(ch, (3, 3), dtype=dtype, name="conv_in")(x)]
        curr_res = cfg.resolution
        for i_level, mult in enumerate(cfg.ch_mult):
            for i_block in range(cfg.num_res_blocks):
                h = Block(
                    ch * mult, cfg.dropout, dtype,
                    name=f"down_{i_level}_block_{i_block}",
                )(hs[-1], emb, det)
                if curr_res in cfg.attn_resolutions:
                    h = SelfAttention2D(
                        dtype, name=f"down_{i_level}_attn_{i_block}")(h)
                hs.append(h)
            if i_level != num_res - 1:
                hs.append(Downsample(cfg.resamp_with_conv, dtype,
                                     name=f"down_{i_level}_downsample")(hs[-1]))
                curr_res //= 2

        # middle
        h = hs[-1]
        h = Block(h.shape[-1], cfg.dropout, dtype,
                  name="mid_block_1")(h, emb, det)
        h = SelfAttention2D(dtype, name="mid_attn_1")(h)
        h = Block(h.shape[-1], cfg.dropout, dtype,
                  name="mid_block_2")(h, emb, det)

        # upsampling
        for i_level in reversed(range(num_res)):
            for i_block in range(cfg.num_res_blocks + 1):
                h = jnp.concatenate([h, hs.pop()], axis=-1)
                h = Block(
                    ch * cfg.ch_mult[i_level], cfg.dropout, dtype,
                    name=f"up_{i_level}_block_{i_block}",
                )(h, emb, det)
                if curr_res in cfg.attn_resolutions:
                    h = SelfAttention2D(
                        dtype, name=f"up_{i_level}_attn_{i_block}")(h)
            if i_level != 0:
                h = Upsample(cfg.resamp_with_conv, dtype,
                             name=f"up_{i_level}_upsample")(h)
                curr_res *= 2

        h = swish(GroupNorm32(name="norm_out")(h))
        h = nn.Conv(cfg.out_channels, (3, 3), dtype=jnp.float32,
                    param_dtype=jnp.float32, name="conv_out")(
            h.astype(jnp.float32))
        return h


def init_unet(key: jax.Array, cfg: UNetConfig):
    """Initialize (model, params) with dummy inputs.

    init is jitted: a single device dispatch instead of one per parameter
    (critical when the accelerator sits behind an RPC tunnel).
    """
    model = CondUNet(cfg)
    x = jnp.zeros((1, cfg.resolution, cfg.resolution, cfg.in_channels))
    t = jnp.zeros((1,), jnp.int32)
    c = jnp.zeros((1,), jnp.int32)
    variables = jax.jit(model.init)({"params": key}, x, t, c)
    return model, variables["params"]
