"""Pallas op tests (interpret mode on CPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from uurg_tpu.ops.flash_attention import (
    _reference_attention,
    attention,
    fused_attention,
)


def _rand_qkv(key, B=2, H=2, T=128, D=64, dtype=jnp.float32):
    ks = jax.random.split(key, 3)
    return tuple(jax.random.normal(k, (B, H, T, D), dtype) for k in ks)


def test_fused_matches_reference_fp32():
    q, k, v = _rand_qkv(jax.random.key(0))
    out = fused_attention(q, k, v, 64, True)  # interpret mode
    ref = _reference_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-5)


def test_fused_matches_reference_bf16():
    q, k, v = _rand_qkv(jax.random.key(1), dtype=jnp.bfloat16)
    out = fused_attention(q, k, v, 64, True)
    ref = _reference_attention(q, k, v)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        rtol=5e-2, atol=5e-2)


def test_fused_gradient_matches_reference():
    q, k, v = _rand_qkv(jax.random.key(2), T=64, D=64)

    def loss_fused(q, k, v):
        return jnp.sum(fused_attention(q, k, v, 64, True) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(_reference_attention(q, k, v) ** 2)

    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_fused, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-4)


def test_dispatcher_fallback_on_cpu():
    q, k, v = _rand_qkv(jax.random.key(3), T=100, D=32)  # unaligned
    out = attention(q, k, v)
    ref = _reference_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5)


def test_fused_gradient_multi_block_accumulation():
    # T > block_q: dk/dv accumulate across sequential q-block grid steps
    q, k, v = _rand_qkv(jax.random.key(4), T=128, D=64)

    def loss_fused(q, k, v):
        return jnp.sum(fused_attention(q, k, v, 32, True) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(_reference_attention(q, k, v) ** 2)

    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_fused, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-4)

def test_padded_head_dim_matches_reference():
    # SD UNet head dims (40/80/160) are not 64-lane aligned; the dispatcher
    # zero-pads D to 64 lanes and pre-scales q so the padded-D softmax scale
    # equals the true D**-0.5 — forward and gradients must match exactly
    for D in (40, 80):
        q, k, v = _rand_qkv(jax.random.key(7), T=128, D=D)
        out = attention(q, k, v, use_pallas=True, interpret=True)
        ref = _reference_attention(q, k, v)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-4, atol=2e-5)


def test_padded_head_dim_gradients():
    q, k, v = _rand_qkv(jax.random.key(8), T=128, D=40)

    def loss_pad(q, k, v):
        return jnp.sum(attention(q, k, v, use_pallas=True,
                                 interpret=True) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(_reference_attention(q, k, v) ** 2)

    g_pad = jax.grad(loss_pad, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_pad, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-4)
