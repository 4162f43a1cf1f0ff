"""CLIP text encoder (ViT-L/14 text tower) in Flax.

Parity target: SD/ldm/modules/encoders/modules.py:230-271
(FrozenCLIPEmbedder over openai/clip-vit-large-patch14): token + position
embeddings, causal pre-LN transformer, final LayerNorm; returns the full
77-token hidden-state sequence as the cross-attention context.

Tokenization: uses the HF CLIPTokenizer when its vocab is available locally
(zero-egress environment — no downloads); otherwise ``hash_tokenize``
provides a deterministic fallback so the pipeline stays runnable end-to-end.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn



@dataclasses.dataclass(frozen=True)
class CLIPTextConfig:
    vocab_size: int = 49408
    max_length: int = 77
    hidden_size: int = 768
    depth: int = 12
    num_heads: int = 12
    dtype: Any = jnp.float32


class CausalMHSA(nn.Module):
    num_heads: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, T, D = x.shape
        H = self.num_heads
        qkv = nn.Dense(3 * D, dtype=self.dtype, name="qkv")(x)
        q, k, v = jnp.split(qkv.reshape(B, T, 3, H, D // H), 3, axis=2)
        q, k, v = (z.squeeze(2).transpose(0, 2, 1, 3) for z in (q, k, v))
        attn = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                          preferred_element_type=jnp.float32)
        attn = attn * (D // H) ** -0.5
        causal = jnp.tril(jnp.ones((T, T), bool))
        attn = jnp.where(causal[None, None], attn, -1e9)
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn.astype(self.dtype), v,
                         preferred_element_type=jnp.float32)
        out = out.astype(self.dtype).transpose(0, 2, 1, 3).reshape(B, T, D)
        return nn.Dense(D, dtype=self.dtype, name="proj")(out)


class CLIPTextEncoder(nn.Module):
    cfg: CLIPTextConfig

    @nn.compact
    def __call__(self, input_ids: jnp.ndarray) -> jnp.ndarray:
        cfg = self.cfg
        B, T = input_ids.shape
        tok = nn.Embed(cfg.vocab_size, cfg.hidden_size, name="token_embed",
                       param_dtype=jnp.float32)(input_ids)
        pos = self.param("pos_embed", nn.initializers.normal(0.01),
                         (cfg.max_length, cfg.hidden_size), jnp.float32)
        h = tok + pos[None, :T]
        for i in range(cfg.depth):
            hn = nn.LayerNorm(dtype=jnp.float32, name=f"ln1_{i}")(h)
            h = h + CausalMHSA(cfg.num_heads, cfg.dtype,
                               name=f"attn_{i}")(hn)
            hn = nn.LayerNorm(dtype=jnp.float32, name=f"ln2_{i}")(h)
            m = nn.Dense(cfg.hidden_size * 4, dtype=cfg.dtype,
                         name=f"fc1_{i}")(hn)
            m = m * jax.nn.sigmoid(1.702 * m)  # quick-gelu (CLIP)
            h = h + nn.Dense(cfg.hidden_size, dtype=cfg.dtype,
                             name=f"fc2_{i}")(m)
        return nn.LayerNorm(dtype=jnp.float32, name="ln_final")(h)


def init_clip_text(key, cfg: CLIPTextConfig | None = None):
    cfg = cfg or CLIPTextConfig()
    model = CLIPTextEncoder(cfg)
    ids = jnp.zeros((1, cfg.max_length), jnp.int32)
    params = jax.jit(model.init)({"params": key}, ids)["params"]
    return model, params


_BOS, _EOS = 49406, 49407


def hash_tokenize(prompts: Sequence[str], max_length: int = 77,
                  vocab_size: int = 49408) -> np.ndarray:
    """Deterministic fallback tokenizer (no vocab files needed): stable
    per-word hashes into the vocab range, BOS/EOS framing, EOS padding."""
    out = np.full((len(prompts), max_length), _EOS, np.int32)
    for i, p in enumerate(prompts):
        ids = [_BOS]
        for w in p.lower().split()[: max_length - 2]:
            ids.append(hash(w) % (vocab_size - 2))
        ids.append(_EOS)
        out[i, : len(ids)] = ids
    return out


def tokenize(prompts: Sequence[str], max_length: int = 77) -> np.ndarray:
    """HF CLIPTokenizer when locally available, else hash fallback."""
    try:
        from transformers import CLIPTokenizer

        tok = CLIPTokenizer.from_pretrained(
            "openai/clip-vit-large-patch14", local_files_only=True)
        enc = tok(list(prompts), truncation=True, max_length=max_length,
                  padding="max_length", return_tensors="np")
        return enc["input_ids"].astype(np.int32)
    except Exception:
        return hash_tokenize(prompts, max_length)
