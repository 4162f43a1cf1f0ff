"""Stable-Diffusion UNet (LDM 860M) in Flax — NHWC, bf16 compute.

TPU-native re-design of the CompVis UNetModel + SpatialTransformer stack
(SD/ldm/modules/diffusionmodules/openaimodel.py:428-1064,
SD/ldm/modules/attention.py:149-303): residual blocks conditioned on the
timestep embedding, spatial transformers with self- + cross-attention over a
text context, skip-connected encoder/decoder. Attention runs as batched
einsums with fp32 softmax (swap-in point for the Pallas flash kernel).

``train_method`` parameter subsetting (full | xattn | selfattn | noxattn |
notime | xlayer | selflayer — SD/train-scripts/nsfw_removal.py:67-77 et al.)
is realized as a gradient mask built by ``train_method_mask`` instead of
optimizer param-group surgery: one pytree of 0/1 leaves multiplied into the
gradients, which composes with the SFR-on saliency mask.
"""
from __future__ import annotations

import dataclasses
import re
from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from uurg_tpu.models.layers import GroupNorm32, timestep_embedding


def silu(x):
    return x * jax.nn.sigmoid(x)


class SDResBlock(nn.Module):
    out_channels: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, emb):
        h = silu(GroupNorm32(name="norm1")(x))
        h = nn.Conv(self.out_channels, (3, 3), dtype=self.dtype,
                    name="conv1")(h)
        eo = nn.Dense(self.out_channels, dtype=self.dtype,
                      name="emb_proj")(silu(emb))
        h = h + eo[:, None, None, :]
        h = silu(GroupNorm32(name="norm2")(h))
        h = nn.Conv(self.out_channels, (3, 3), dtype=self.dtype,
                    name="conv2")(h)
        if x.shape[-1] != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                        name="skip")(x)
        return x + h


class CrossAttention(nn.Module):
    heads: int
    dim_head: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, context=None):
        self_attn = context is None
        context = x if self_attn else context
        B, T, _ = x.shape
        S = context.shape[1]
        H, D = self.heads, self.dim_head
        inner = H * D
        q = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_q")(x)
        k = nn.Dense(inner, use_bias=False, dtype=self.dtype,
                     name="to_k")(context)
        v = nn.Dense(inner, use_bias=False, dtype=self.dtype,
                     name="to_v")(context)
        q = q.reshape(B, T, H, D).transpose(0, 2, 1, 3)
        k = k.reshape(B, S, H, D).transpose(0, 2, 1, 3)
        v = v.reshape(B, S, H, D).transpose(0, 2, 1, 3)
        if self_attn and T % 128 == 0:
            # the hot path: the 64x64-latent self-attention is T=4096 over
            # 8 heads — exactly where keeping the (T x T) scores out of HBM
            # pays (SD/ldm/modules/attention.py:149-303 materializes them).
            # Cross-attn (S=77 context) stays on the einsum path: padding
            # k/v to a 128 block would need -inf score masking for nothing
            # — its score matrix is 53x smaller.
            from uurg_tpu.ops.flash_attention import attention

            out = attention(q, k, v)
        else:
            attn = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                              preferred_element_type=jnp.float32) * (D**-0.5)
            attn = jax.nn.softmax(attn, axis=-1)
            out = jnp.einsum("bhqk,bhkd->bhqd", attn.astype(self.dtype), v,
                             preferred_element_type=jnp.float32)
        out = out.astype(self.dtype).transpose(0, 2, 1, 3).reshape(B, T, inner)
        return nn.Dense(x.shape[-1], dtype=self.dtype, name="to_out")(out)


class GEGLU(nn.Module):
    dim_out: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        h = nn.Dense(self.dim_out * 2, dtype=self.dtype, name="proj")(x)
        a, b = jnp.split(h, 2, axis=-1)
        return a * jax.nn.gelu(b)


class BasicTransformerBlock(nn.Module):
    heads: int
    dim_head: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, context):
        h = nn.LayerNorm(dtype=jnp.float32, name="norm1")(
            x.astype(jnp.float32)).astype(self.dtype)
        x = x + CrossAttention(self.heads, self.dim_head, self.dtype,
                               name="attn1")(h)          # self-attn
        h = nn.LayerNorm(dtype=jnp.float32, name="norm2")(
            x.astype(jnp.float32)).astype(self.dtype)
        x = x + CrossAttention(self.heads, self.dim_head, self.dtype,
                               name="attn2")(h, context)  # cross-attn
        h = nn.LayerNorm(dtype=jnp.float32, name="norm3")(
            x.astype(jnp.float32)).astype(self.dtype)
        dim = x.shape[-1]
        h = GEGLU(dim * 4, self.dtype, name="ff_geglu")(h)
        x = x + nn.Dense(dim, dtype=self.dtype, name="ff_out")(h)
        return x


class SpatialTransformer(nn.Module):
    heads: int
    dim_head: int
    depth: int = 1
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, context):
        B, H, W, C = x.shape
        h = GroupNorm32(name="norm")(x)
        h = nn.Conv(C, (1, 1), dtype=self.dtype, name="proj_in")(h)
        h = h.reshape(B, H * W, C)
        for i in range(self.depth):
            h = BasicTransformerBlock(self.heads, self.dim_head, self.dtype,
                                      name=f"tblock_{i}")(h, context)
        h = h.reshape(B, H, W, C)
        h = nn.Conv(C, (1, 1), dtype=self.dtype, name="proj_out")(h)
        return x + h


@dataclasses.dataclass(frozen=True)
class SDUNetConfig:
    in_channels: int = 4
    out_channels: int = 4
    model_channels: int = 320
    channel_mult: tuple = (1, 2, 4, 4)
    num_res_blocks: int = 2
    attention_ds: tuple = (1, 2, 4)    # downsample factors with attention
    num_heads: int = 8
    context_dim: int = 768
    transformer_depth: int = 1
    dtype: Any = jnp.bfloat16
    remat: bool = True   # rematerialize blocks in backward (860M model +
                         # 4096-token attention activations on a 16GB chip)
    remat_policy: str | None = None  # None = full remat; "dots" saves MXU
                         # (matmul/conv) outputs inside each remat block and
                         # recomputes only elementwise/norm work — trades
                         # HBM for recompute FLOPs


class SDUNet(nn.Module):
    cfg: SDUNetConfig

    @nn.compact
    def __call__(self, x, t, context):
        cfg = self.cfg
        ch0 = cfg.model_channels
        emb = timestep_embedding(t, ch0)
        emb = nn.Dense(ch0 * 4, dtype=cfg.dtype, name="time_embed_0")(
            emb.astype(cfg.dtype))
        emb = nn.Dense(ch0 * 4, dtype=cfg.dtype, name="time_embed_2")(silu(emb))
        context = context.astype(cfg.dtype)

        policy = {"dots": jax.checkpoint_policies
                  .dots_with_no_batch_dims_saveable,
                  None: None}[cfg.remat_policy]
        res_cls = (nn.remat(SDResBlock, prevent_cse=False, policy=policy)
                   if cfg.remat else SDResBlock)
        attn_cls = (nn.remat(SpatialTransformer, prevent_cse=False,
                             policy=policy)
                    if cfg.remat else SpatialTransformer)

        def attn(h, name):
            return attn_cls(
                cfg.num_heads, h.shape[-1] // cfg.num_heads,
                cfg.transformer_depth, cfg.dtype, name=name)(h, context)

        hs = [nn.Conv(ch0, (3, 3), dtype=cfg.dtype, name="conv_in")(
            x.astype(cfg.dtype))]
        ds = 1
        for i, mult in enumerate(cfg.channel_mult):
            for j in range(cfg.num_res_blocks):
                h = res_cls(ch0 * mult, cfg.dtype,
                            name=f"down_{i}_res_{j}")(hs[-1], emb)
                if ds in cfg.attention_ds:
                    h = attn(h, f"down_{i}_attn_{j}")
                hs.append(h)
            if i != len(cfg.channel_mult) - 1:
                # symmetric pad 1 matches the CompVis stride-2 Downsample
                hs.append(nn.Conv(hs[-1].shape[-1], (3, 3), (2, 2),
                                  padding=((1, 1), (1, 1)), dtype=cfg.dtype,
                                  name=f"down_{i}_downsample")(hs[-1]))
                ds *= 2

        h = res_cls(hs[-1].shape[-1], cfg.dtype, name="mid_res_1")(hs[-1], emb)
        h = attn(h, "mid_attn")
        h = res_cls(h.shape[-1], cfg.dtype, name="mid_res_2")(h, emb)

        for i in reversed(range(len(cfg.channel_mult))):
            for j in range(cfg.num_res_blocks + 1):
                h = jnp.concatenate([h, hs.pop()], axis=-1)
                h = res_cls(ch0 * cfg.channel_mult[i], cfg.dtype,
                            name=f"up_{i}_res_{j}")(h, emb)
                if ds in cfg.attention_ds:
                    h = attn(h, f"up_{i}_attn_{j}")
            if i != 0:
                B, H, W, C = h.shape
                h = jnp.repeat(jnp.repeat(h, 2, axis=1), 2, axis=2)
                h = nn.Conv(C, (3, 3), dtype=cfg.dtype,
                            name=f"up_{i}_upsample")(h)
                ds //= 2

        h = silu(GroupNorm32(name="norm_out")(h))
        return nn.Conv(cfg.out_channels, (3, 3), dtype=jnp.float32,
                       param_dtype=jnp.float32, name="conv_out")(
            h.astype(jnp.float32))


def init_sd_unet(key, cfg: SDUNetConfig, latent_size: int = 64,
                 context_len: int = 77):
    model = SDUNet(cfg)
    x = jnp.zeros((1, latent_size, latent_size, cfg.in_channels))
    t = jnp.zeros((1,), jnp.int32)
    ctx = jnp.zeros((1, context_len, cfg.context_dim))
    params = jax.jit(model.init)({"params": key}, x, t, ctx)["params"]
    return model, params


# -- train_method parameter-subset masks -----------------------------------
#
# The reference selects trainable parameters by iterating
# `model.model.diffusion_model.named_parameters()` and applying substring /
# prefix tests on the CompVis torch names
# (SD/train-scripts/train-esd.py:209-235, nsfw_removal.py:67-77):
#   noxattn  : all except  name.startswith("out.") | "attn2" | "time_embed"
#   selfattn : "attn1" in name
#   xattn    : "attn2" in name
#   full     : everything
#   notime   : all except  name.startswith("out.") | "time_embed"
#   xlayer   : "attn2"  and ("output_blocks.6." in name or "output_blocks.8.")
#   selflayer: "attn1"  and ("input_blocks.4."  in name or "input_blocks.7.")
#
# To apply those rules verbatim we map every Flax param path to its CompVis
# torch-name equivalent (block numbering: input_blocks.0 = conv_in, then
# num_res_blocks res(+attn) blocks plus one downsample slot per level;
# output_blocks get (num_res_blocks+1) slots per level in reversed order),
# then run the reference's decision function on the mapped name.

def _arch_dims(paths):
    """Infer (levels, num_res_blocks) from the flattened param paths."""
    levels, nres = 1, 1
    for p in paths:
        # decoder levels run num_res_blocks + 1 res blocks, so only the
        # encoder (down_*) paths reflect num_res_blocks itself
        m = re.match(r"(?:down|up)_(\d+)_", p)
        if m:
            levels = max(levels, int(m.group(1)) + 1)
        m = re.match(r"down_(\d+)_res_(\d+)", p)
        if m:
            nres = max(nres, int(m.group(2)) + 1)
    return levels, nres


def _torch_name(p: str, levels: int, nres: int) -> str:
    """Map a '/'-joined Flax param path to its CompVis torch-name
    equivalent (enough of it for the reference's substring tests)."""
    head, _, rest = p.partition("/")
    rest = rest.replace("/", ".")
    per = nres + 1  # res(+attn) slots plus the down/up-sample slot
    m = re.match(r"down_(\d+)_(res|attn)_(\d+)$", head)
    if m:
        i, kind, j = int(m.group(1)), m.group(2), int(m.group(3))
        sub = "0" if kind == "res" else "1.transformer_blocks"
        return f"input_blocks.{1 + i * per + j}.{sub}.{rest}"
    m = re.match(r"down_(\d+)_downsample$", head)
    if m:
        return f"input_blocks.{1 + int(m.group(1)) * per + nres}.0.op.{rest}"
    m = re.match(r"up_(\d+)_(res|attn)_(\d+)$", head)
    if m:
        i, kind, j = int(m.group(1)), m.group(2), int(m.group(3))
        sub = "0" if kind == "res" else "1.transformer_blocks"
        return f"output_blocks.{(levels - 1 - i) * per + j}.{sub}.{rest}"
    m = re.match(r"up_(\d+)_upsample$", head)
    if m:
        i = int(m.group(1))
        return f"output_blocks.{(levels - 1 - i) * per + nres}.2.conv.{rest}"
    fixed = {
        "conv_in": "input_blocks.0.0",
        "mid_res_1": "middle_block.0",
        "mid_attn": "middle_block.1.transformer_blocks",
        "mid_res_2": "middle_block.2",
        "time_embed_0": "time_embed.0",
        "time_embed_2": "time_embed.2",
        "norm_out": "out.0",
        "conv_out": "out.2",
    }
    return f"{fixed[head]}.{rest}"


def reference_train_method_select(name: str, method: str) -> bool:
    """The reference's parameter-selection predicate, transcribed verbatim
    from SD/train-scripts/train-esd.py:209-235 over CompVis torch names."""
    if method == "full":
        return True
    if method == "noxattn":
        return not (name.startswith("out.") or "attn2" in name
                    or "time_embed" in name)
    if method == "selfattn":
        return "attn1" in name
    if method == "xattn":
        return "attn2" in name
    if method == "notime":
        return not (name.startswith("out.") or "time_embed" in name)
    if method == "xlayer":
        return "attn2" in name and ("output_blocks.6." in name
                                    or "output_blocks.8." in name)
    if method == "selflayer":
        return "attn1" in name and ("input_blocks.4." in name
                                    or "input_blocks.7." in name)
    raise ValueError(f"unknown train_method {method!r}")


def _path_decisions(params, method: str):
    flat = jax.tree_util.tree_leaves_with_path(params)
    paths = ["/".join(str(k.key) for k in path) for path, _ in flat]
    levels, nres = _arch_dims(paths)
    return {p: reference_train_method_select(_torch_name(p, levels, nres),
                                             method)
            for p in paths}


def train_method_mask(params, method: str):
    """0/1 gradient mask implementing the reference's train_method param
    selection (SD/train-scripts/train-esd.py:209-235 policy names)."""
    decisions = _path_decisions(params, method)
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: jnp.full(
            leaf.shape,
            float(decisions["/".join(str(k.key) for k in path)]),
            jnp.float32),
        params)


def train_method_leaf_mask(params, method: str):
    """Static (python-bool) per-leaf mask for ``optax.masked``: frozen
    layers carry NO optimizer state at all — on a 16GB chip this is what
    makes the 860M SD UNet trainable (Adam state only for the selected
    parameter subset). train_method subsets always select whole layers, so
    the leaf-level mask is exact."""
    decisions = _path_decisions(params, method)
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: decisions["/".join(str(k.key) for k in path)],
        params)
