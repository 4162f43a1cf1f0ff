"""CLIP text encoder (ViT-L/14 text tower) in Flax.

Parity target: SD/ldm/modules/encoders/modules.py:230-271
(FrozenCLIPEmbedder over openai/clip-vit-large-patch14): token + position
embeddings, causal pre-LN transformer, final LayerNorm; returns the full
77-token hidden-state sequence as the cross-attention context.

Tokenization (SD/ldm/modules/encoders/modules.py:230-271 runs the real CLIP
BPE): three tiers, the first available wins, all process-deterministic:

1. ``CLIPBPETokenizer`` — a from-scratch implementation of CLIP's BPE
   (lowercase + whitespace cleanup, byte-to-unicode table, greedy pair
   merges, word-final ``</w>``) that loads a local vocab: either the openai
   ``bpe_simple_vocab_16e6.txt.gz`` (path via ``$UURG_CLIP_BPE``) or an HF
   ``vocab.json`` + ``merges.txt`` directory.
2. The HF ``CLIPTokenizer`` if its files are in the local cache.
3. ``hash_tokenize`` — stable per-word ``zlib.crc32`` ids (NOT Python
   ``hash()``, which is salted per process).

``active_tokenizer()`` reports which tier is live.
"""
from __future__ import annotations

import dataclasses
import functools
import gzip
import json
import os
import re
import zlib
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

# CLIP's text-splitting regex (contractions, letter runs, digit singles,
# symbol runs), minus the ftfy pass; \p{L}/\p{N} approximated with the
# std-re unicode word classes
_CLIP_PAT = re.compile(
    r"<\|startoftext\|>|<\|endoftext\|>|'s|'t|'re|'ve|'m|'ll|'d"
    r"|[^\W\d_]+|\d|[^\s\w]+",
    re.IGNORECASE)


def _bytes_to_unicode() -> dict[int, str]:
    """The GPT-2/CLIP reversible byte -> printable-unicode table."""
    bs = (list(range(ord("!"), ord("~") + 1))
          + list(range(ord("\xa1"), ord("\xac") + 1))
          + list(range(ord("\xae"), ord("\xff") + 1)))
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return dict(zip(bs, [chr(c) for c in cs]))


class CLIPBPETokenizer:
    """CLIP's BPE, reimplemented: greedy lowest-rank pair merging over
    byte-mapped words with a ``</w>`` end-of-word marker.

    Vocab sources (``path``): the openai ``bpe_simple_vocab_16e6.txt.gz``
    merges list, or a directory holding HF ``vocab.json`` + ``merges.txt``.
    """

    def __init__(self, path: str):
        self.byte_encoder = _bytes_to_unicode()
        if os.path.isdir(path):
            with open(os.path.join(path, "vocab.json")) as f:
                self.encoder = json.load(f)
            with open(os.path.join(path, "merges.txt")) as f:
                lines = f.read().split("\n")
            lines = [l for l in lines[1:] if l and not l.startswith("#")]
            merges = [tuple(l.split()) for l in lines][:48894]
        else:
            with gzip.open(path, "rt", encoding="utf-8") as f:
                lines = f.read().split("\n")
            merges = [tuple(m.split()) for m in lines[1:48894 + 1]]
            vocab = list(self.byte_encoder.values())
            vocab += [v + "</w>" for v in vocab]
            vocab += ["".join(m) for m in merges]
            vocab += ["<|startoftext|>", "<|endoftext|>"]
            self.encoder = {tok: i for i, tok in enumerate(vocab)}
        self.bpe_ranks = {m: i for i, m in enumerate(merges)}
        self.cache: dict[str, list[str]] = {}

    def _bpe(self, token: str) -> list[str]:
        if token in self.cache:
            return self.cache[token]
        word = list(token[:-1]) + [token[-1] + "</w>"]
        while len(word) > 1:
            pairs = set(zip(word[:-1], word[1:]))
            best = min(pairs,
                       key=lambda p: self.bpe_ranks.get(p, float("inf")))
            if best not in self.bpe_ranks:
                break
            merged, i = [], 0
            while i < len(word):
                if (i < len(word) - 1
                        and (word[i], word[i + 1]) == best):
                    merged.append(word[i] + word[i + 1])
                    i += 2
                else:
                    merged.append(word[i])
                    i += 1
            word = merged
        self.cache[token] = word
        return word

    def encode(self, text: str) -> list[int]:
        text = re.sub(r"\s+", " ", text.lower()).strip()
        ids: list[int] = []
        for tok in _CLIP_PAT.findall(text):
            mapped = "".join(self.byte_encoder[b] for b in tok.encode("utf-8"))
            ids.extend(self.encoder[piece] for piece in self._bpe(mapped))
        return ids

    def __call__(self, prompts: Sequence[str],
                 max_length: int = 77) -> np.ndarray:
        out = np.full((len(prompts), max_length), _EOS, np.int32)
        for i, p in enumerate(prompts):
            ids = [_BOS] + self.encode(p)[: max_length - 2] + [_EOS]
            out[i, : len(ids)] = ids
        return out


def _find_bpe_vocab() -> str | None:
    """Locate a CLIP BPE vocab on this machine (no downloads)."""
    cands = [os.environ.get("UURG_CLIP_BPE", "")]
    hub = os.path.expanduser("~/.cache/huggingface/hub")
    if os.path.isdir(hub):
        for root, _dirs, files in os.walk(hub):
            if "merges.txt" in files and "vocab.json" in files:
                cands.append(root)
    for c in cands:
        if c and os.path.exists(c):
            return c
    return None


@functools.lru_cache(maxsize=1)
def _resolve_tokenizer():
    """(name, callable(prompts, max_length) -> ids) for the best local tier."""
    path = _find_bpe_vocab()
    if path:
        try:
            return f"clip-bpe:{path}", CLIPBPETokenizer(path)
        except Exception:
            pass
    try:
        from transformers import CLIPTokenizer

        tok = CLIPTokenizer.from_pretrained(
            "openai/clip-vit-large-patch14", local_files_only=True)

        def hf(prompts, max_length):
            enc = tok(list(prompts), truncation=True, max_length=max_length,
                      padding="max_length", return_tensors="np")
            return enc["input_ids"].astype(np.int32)

        return "hf-clip", hf
    except Exception:
        return "crc32-fallback", hash_tokenize


def active_tokenizer() -> str:
    """Which tokenization tier is live in this process."""
    return _resolve_tokenizer()[0]


def hash_tokenize(prompts: Sequence[str], max_length: int = 77,
                  vocab_size: int = 49408) -> np.ndarray:
    """Last-resort fallback (no vocab files on the machine): stable
    ``zlib.crc32`` per-word ids — identical across processes, unlike
    Python's salted ``hash()``. NOT the real CLIP vocabulary; prompts
    tokenized this way cannot be used with converted CLIP weights."""
    out = np.full((len(prompts), max_length), _EOS, np.int32)
    for i, p in enumerate(prompts):
        ids = [_BOS]
        for w in p.lower().split()[: max_length - 2]:
            ids.append(zlib.crc32(w.encode("utf-8")) % (vocab_size - 2))
        ids.append(_EOS)
        out[i, : len(ids)] = ids
    return out


def tokenize(prompts: Sequence[str], max_length: int = 77) -> np.ndarray:
    """Tokenize with the best locally-available tier (see module docstring;
    ``active_tokenizer()`` to inspect)."""
    return _resolve_tokenizer()[1](prompts, max_length)
