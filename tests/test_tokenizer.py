"""CLIP tokenization tiers: BPE algorithm correctness + cross-process
determinism (parity: SD/ldm/modules/encoders/modules.py:230-271 tokenizes
with the real CLIP BPE; round-1 fallback used salted hash())."""
import json
import subprocess
import sys

import numpy as np

from uurg_tpu.models.clip_text import (
    CLIPBPETokenizer,
    _bytes_to_unicode,
    active_tokenizer,
    hash_tokenize,
    tokenize,
)


def _tiny_vocab_dir(tmp_path):
    """HF-style vocab.json + merges.txt covering single byte-chars plus the
    merges needed to tokenize 'hello' as ['hell', 'o</w>']."""
    chars = list(_bytes_to_unicode().values())
    vocab = {c: i for i, c in enumerate(chars)}
    for c in chars:
        vocab[c + "</w>"] = len(vocab)
    merges = ["h e", "l l", "he ll"]
    for m in merges:
        vocab["".join(m.split())] = len(vocab)
    vocab["<|startoftext|>"] = len(vocab)
    vocab["<|endoftext|>"] = len(vocab)
    (tmp_path / "vocab.json").write_text(json.dumps(vocab))
    (tmp_path / "merges.txt").write_text(
        "#version: 0.2\n" + "\n".join(merges) + "\n")
    return str(tmp_path)


def test_bpe_merge_order(tmp_path):
    tok = CLIPBPETokenizer(_tiny_vocab_dir(tmp_path))
    ids = tok.encode("hello")
    enc = tok.encoder
    assert ids == [enc["hell"], enc["o</w>"]]
    # unknown word falls back to char pieces with word-final </w>
    ids2 = tok.encode("ab")
    assert ids2 == [enc["a"], enc["b</w>"]]


def test_bpe_whitespace_and_case(tmp_path):
    tok = CLIPBPETokenizer(_tiny_vocab_dir(tmp_path))
    assert tok.encode("  HeLLo   ") == tok.encode("hello")
    # two words -> two </w> boundaries
    two = tok.encode("hello hello")
    assert two == tok.encode("hello") * 2


def test_bpe_padding_frame(tmp_path):
    tok = CLIPBPETokenizer(_tiny_vocab_dir(tmp_path))
    out = tok(["hello"], max_length=8)
    assert out.shape == (1, 8)
    assert out[0, 0] == 49406
    # EOS terminator + EOS padding
    assert (out[0, 3:] == 49407).all()


def test_crc32_fallback_stable():
    a = hash_tokenize(["a photo of a nude person"], 16)
    b = hash_tokenize(["a photo of a nude person"], 16)
    np.testing.assert_array_equal(a, b)


import pytest


@pytest.mark.slow  # two fresh jax-importing interpreters
def test_tokenize_deterministic_across_processes():
    """Two FRESH interpreter processes must agree on token ids (round-1
    failure mode: PYTHONHASHSEED-salted hash())."""
    snippet = (
        "from uurg_tpu.models.clip_text import tokenize;"
        "print(tokenize(['a photo of a dog', 'nudity'], 16).tolist())")
    outs = [
        subprocess.run([sys.executable, "-c", snippet], capture_output=True,
                       text=True, check=True).stdout
        for _ in range(2)
    ]
    assert outs[0] == outs[1]
    assert "[" in outs[0]


@pytest.mark.slow  # fast-gate budget: moved after the r3 gate audit
def test_active_tokenizer_reports_tier():
    assert active_tokenizer().split(":")[0] in (
        "clip-bpe", "hf-clip", "crc32-fallback")
