"""DiT (Diffusion Transformer) family in Flax — NHWC latents, bf16 compute.

TPU-native re-design of the reference DiT (DiT/models.py:27-370): patchify,
2D sin-cos positional embedding, adaLN-Zero blocks, learned-sigma output.
Design differences:

- conditioning dropout = explicit keep-mask (pure function);
- CFG is applied by the sampler via one batched double-forward
  (`uurg_tpu.diffusion.sampling.cfg_model_fn`), with an optional
  ``cfg_channels`` restriction reproducing the reference's 3-channel
  guidance quirk (DiT/models.py:250-267);
- attention is a single fused einsum path in bf16 with fp32 softmax
  (swap-in point for the Pallas flash kernel in uurg_tpu.ops).
"""
from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


Dtype = Any


def dit_timestep_embedding(t: jnp.ndarray, dim: int,
                           max_period: float = 10000.0) -> jnp.ndarray:
    """DiT/ADM timestep embedding: freqs exp(-ln(P) * i / half), [cos | sin]
    (DiT/models.py TimestepEmbedder.timestep_embedding)."""
    half = dim // 2
    freqs = jnp.exp(
        -jnp.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half)
    args = t.astype(jnp.float32)[:, None] * freqs[None]
    return jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)


def sincos_2d_pos_embed(dim: int, grid: int) -> np.ndarray:
    """Fixed 2D sin-cos positional embedding (DiT/models.py:270-312 math)."""
    def one_dim(dim, pos):
        omega = np.arange(dim // 2, dtype=np.float64) / (dim / 2.0)
        omega = 1.0 / 10000**omega
        out = np.einsum("m,d->md", pos.reshape(-1), omega)
        return np.concatenate([np.sin(out), np.cos(out)], axis=1)

    g = np.arange(grid, dtype=np.float32)
    gy, gx = np.meshgrid(g, g, indexing="ij")
    emb = np.concatenate(
        [one_dim(dim // 2, gx), one_dim(dim // 2, gy)], axis=1)
    return emb.astype(np.float32)  # (grid*grid, dim)


class MHSA(nn.Module):
    """Multi-head self-attention; fp32 softmax, bf16 matmuls.

    Uses the Pallas fused-attention kernel on TPU when shapes align
    (uurg_tpu.ops.flash_attention); XLA einsum path elsewhere.
    """

    num_heads: int
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        from uurg_tpu.ops.flash_attention import attention

        B, T, D = x.shape
        H = self.num_heads
        qkv = nn.Dense(3 * D, dtype=self.dtype, name="qkv")(x)
        q, k, v = jnp.split(qkv.reshape(B, T, 3, H, D // H), 3, axis=2)
        q, k, v = (z.squeeze(2).transpose(0, 2, 1, 3) for z in (q, k, v))
        out = attention(q, k, v)
        out = out.astype(self.dtype).transpose(0, 2, 1, 3).reshape(B, T, D)
        # tag for the "attn" remat policy: saving this one tensor per block
        # skips recomputing the attention kernel in the backward pass
        from jax.ad_checkpoint import checkpoint_name
        out = checkpoint_name(out, "attn_out")
        return nn.Dense(D, dtype=self.dtype, name="proj")(out)


def modulate(x, shift, scale):
    return x * (1.0 + scale[:, None, :]) + shift[:, None, :]


class DiTBlock(nn.Module):
    """adaLN-Zero transformer block (DiT/models.py:101-123)."""

    hidden: int
    num_heads: int
    mlp_ratio: float = 4.0
    dtype: Dtype = jnp.bfloat16
    # dtype of the LN+modulate elementwise chains between the matmuls.
    # f32 matches the reference bit-for-bit; bf16 halves that HBM traffic
    # (LN statistics stay f32 either way — flax computes reduction stats
    # in at-least-f32). Perf measured on v5e: see scripts/exp_dit_remat.py
    norm_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, c: jnp.ndarray) -> jnp.ndarray:
        nd = self.norm_dtype
        mods = nn.Dense(6 * self.hidden, dtype=jnp.float32,
                        kernel_init=nn.initializers.zeros,
                        name="adaLN_modulation")(jax.nn.silu(c))
        (shift_msa, scale_msa, gate_msa,
         shift_mlp, scale_mlp, gate_mlp) = jnp.split(
            mods.astype(nd), 6, axis=-1)

        h = nn.LayerNorm(use_bias=False, use_scale=False, dtype=nd,
                         name="norm1")(x.astype(nd))
        h = modulate(h, shift_msa, scale_msa).astype(self.dtype)
        x = x + gate_msa[:, None, :].astype(self.dtype) * MHSA(
            self.num_heads, self.dtype, name="attn")(h)

        h = nn.LayerNorm(use_bias=False, use_scale=False, dtype=nd,
                         name="norm2")(x.astype(nd))
        h = modulate(h, shift_mlp, scale_mlp).astype(self.dtype)
        mlp_dim = int(self.hidden * self.mlp_ratio)
        h = nn.Dense(mlp_dim, dtype=self.dtype, name="mlp_fc1")(h)
        h = jax.nn.gelu(h, approximate=True)
        h = nn.Dense(self.hidden, dtype=self.dtype, name="mlp_fc2")(h)
        return x + gate_mlp[:, None, :].astype(self.dtype) * h


class _ScanDiTBlock(DiTBlock):
    """DiTBlock with a (carry, out) signature for nn.scan over depth."""

    @nn.compact
    def __call__(self, x, c):  # type: ignore[override]
        return DiTBlock.__call__(self, x, c), None


@dataclasses.dataclass(frozen=True)
class DiTConfig:
    input_size: int = 32           # latent spatial size
    patch_size: int = 2
    in_channels: int = 4
    hidden_size: int = 1152
    depth: int = 28
    num_heads: int = 16
    mlp_ratio: float = 4.0
    num_classes: int = 1000
    learn_sigma: bool = True
    dtype: Any = jnp.bfloat16
    scan_blocks: bool = True       # lax.scan over the depth axis: the 28
                                   # identical blocks compile ONCE (order-of-
                                   # magnitude compile-time win on TPU)
    remat: bool = True             # rematerialize block activations in bwd
    norm_dtype: Any = jnp.float32  # LN+modulate chain dtype (see DiTBlock)
    remat_policy: str | None = None  # None = full remat; "dots" saves MXU
                                   # (matmul) outputs and recomputes only
                                   # elementwise/norm work in the backward
                                   # (OOMs DiT-XL b16 on one 16GB chip);
                                   # "attn" saves just the per-block
                                   # attention outputs — skips recomputing
                                   # the attention kernel at ~590KB/sample/
                                   # block of extra HBM


class DiT(nn.Module):
    cfg: DiTConfig

    @nn.compact
    def __call__(self, x: jnp.ndarray, t: jnp.ndarray, y: jnp.ndarray,
                 cond_keep: jnp.ndarray | None = None, *,
                 train: bool = False) -> jnp.ndarray:
        cfg = self.cfg
        B, H, W, C = x.shape
        p, D = cfg.patch_size, cfg.hidden_size
        grid = H // p

        # patchify: conv p x p stride p -> (B, T, D)
        h = nn.Conv(D, (p, p), strides=(p, p), dtype=cfg.dtype,
                    name="patch_embed")(x.astype(cfg.dtype))
        h = h.reshape(B, grid * grid, D)
        pos = sincos_2d_pos_embed(D, grid)
        h = h + jnp.asarray(pos, cfg.dtype)[None]

        # timestep embedding: DiT convention (cos|sin, freqs /half —
        # differs from the tensor2tensor layout in models/layers.py; matters
        # for loading the public DiT checkpoints) -> MLP(D)
        temb = dit_timestep_embedding(t, 256)
        temb = nn.Dense(D, dtype=jnp.float32, name="t_mlp1")(temb)
        temb = nn.Dense(D, dtype=jnp.float32, name="t_mlp2")(jax.nn.silu(temb))

        # label embedding with null row for CFG dropout
        table = nn.Embed(cfg.num_classes + 1, D, name="y_embed",
                         param_dtype=jnp.float32)
        if cond_keep is not None:
            y = jnp.where(cond_keep, y, cfg.num_classes)
        yemb = table(y)
        c = temb + yemb

        if cfg.scan_blocks:
            block_cls = _ScanDiTBlock
            if cfg.remat:
                cp = jax.checkpoint_policies
                policy = {"dots": cp.dots_with_no_batch_dims_saveable,
                          "attn": cp.save_only_these_names("attn_out"),
                          # "dots" can't see inside the flash-attention
                          # pallas_call, so the attention kernel is still
                          # recomputed in the backward; saving attn_out on
                          # top skips that too (~590KB/sample/block more)
                          "attn+dots": cp.save_from_both_policies(
                              cp.dots_with_no_batch_dims_saveable,
                              cp.save_only_these_names("attn_out")),
                          None: None}[cfg.remat_policy]
                block_cls = nn.remat(block_cls, prevent_cse=False,
                                     policy=policy)
            scan = nn.scan(
                block_cls,
                variable_axes={"params": 0},
                split_rngs={"params": True},
                length=cfg.depth,
                in_axes=nn.broadcast,
            )
            h, _ = scan(D, cfg.num_heads, cfg.mlp_ratio, cfg.dtype,
                        cfg.norm_dtype, name="blocks")(h, c)
        else:
            for i in range(cfg.depth):
                h = DiTBlock(D, cfg.num_heads, cfg.mlp_ratio, cfg.dtype,
                             cfg.norm_dtype, name=f"block_{i}")(h, c)

        # final adaLN + zero-init linear to p*p*outC
        out_c = C * 2 if cfg.learn_sigma else C
        mods = nn.Dense(2 * D, dtype=jnp.float32,
                        kernel_init=nn.initializers.zeros,
                        name="final_adaLN")(jax.nn.silu(c))
        shift, scale = jnp.split(mods, 2, axis=-1)
        h = nn.LayerNorm(use_bias=False, use_scale=False, dtype=jnp.float32,
                         name="final_norm")(h.astype(jnp.float32))
        h = modulate(h, shift, scale)
        h = nn.Dense(p * p * out_c, dtype=jnp.float32,
                     kernel_init=nn.initializers.zeros,
                     name="final_linear")(h)

        # unpatchify -> (B, H, W, out_c)
        h = h.reshape(B, grid, grid, p, p, out_c)
        h = jnp.einsum("bhwpqc->bhpwqc", h).reshape(B, H, W, out_c)
        return h


def _mk(depth, hidden, heads):
    def factory(patch, **kw):
        return DiTConfig(patch_size=patch, hidden_size=hidden, depth=depth,
                         num_heads=heads, **kw)
    return factory


_SIZES = {"XL": _mk(28, 1152, 16), "L": _mk(24, 1024, 16),
          "B": _mk(12, 768, 12), "S": _mk(12, 384, 6)}

# DiT_models registry parity (DiT/models.py:328-370)
DiT_configs = {
    f"DiT-{s}/{p}": (lambda s=s, p=p: _SIZES[s](p))
    for s in _SIZES for p in (2, 4, 8)
}


def build_dit(name: str, **overrides) -> tuple[DiT, DiTConfig]:
    cfg = DiT_configs[name]()
    if overrides:
        cfg = dataclasses.replace(cfg, **overrides)
    return DiT(cfg), cfg


def init_dit(key: jax.Array, cfg: DiTConfig):
    model = DiT(cfg)
    x = jnp.zeros((1, cfg.input_size, cfg.input_size, cfg.in_channels))
    t = jnp.zeros((1,), jnp.int32)
    y = jnp.zeros((1,), jnp.int32)
    params = jax.jit(model.init)({"params": key}, x, t, y)["params"]
    return model, params
