"""Fused attention Pallas kernel for TPU.

The attention in DiT blocks (1024 tokens), SD spatial transformers (<=4096
tokens) and the DDPM UNet attn blocks (256 tokens) is the hottest non-conv
op. This kernel computes softmax(q k^T / sqrt(d)) v with the score matrix
kept in VMEM only — no HBM materialization of the (T x T) attention, fp32
softmax, bf16 matmuls on the MXU.

Design: grid over (batch*heads, q blocks). For the sequence lengths in this
framework a full k/v per head fits comfortably in VMEM (4096 x 128 x 2B =
1MB), so each program consumes the whole k/v block and one q tile — an
online-softmax inner loop is unnecessary and would only add VPU overhead.

Backward: jax.custom_vjp with a plain-XLA recomputation backward (flash
backward in Pallas is a round-2 optimization; XLA already fuses the
recompute well).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float):
    q = q_ref[0]                      # (Bq, D)
    k = k_ref[0]                      # (T, D)
    v = v_ref[0]                      # (T, D)
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale                          # (Bq, T) fp32
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    p = (p / l).astype(v.dtype)
    o = jax.lax.dot_general(
        p, v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[0] = o.astype(o_ref.dtype)


def _fused_attention_fwd_impl(q, k, v, *, block_q: int, interpret: bool):
    B, H, T, D = q.shape
    scale = D ** -0.5
    bh = B * H
    qf = q.reshape(bh, T, D)
    kf = k.reshape(bh, T, D)
    vf = v.reshape(bh, T, D)
    block_q = min(block_q, T)
    grid = (bh, pl.cdiv(T, block_q))

    out = pl.pallas_call(
        functools.partial(_attn_kernel, scale=scale),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, D), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T, D), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T, D), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, D), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bh, T, D), q.dtype),
        interpret=interpret,
    )(qf, kf, vf)
    return out.reshape(B, H, T, D)


def _reference_attention(q, k, v):
    scale = q.shape[-1] ** -0.5
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                   preferred_element_type=jnp.float32) * scale
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", p.astype(v.dtype), v,
                      preferred_element_type=jnp.float32).astype(q.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def fused_attention(q, k, v, block_q: int = 256, interpret: bool = False):
    """softmax(q k^T / sqrt(D)) v — (B, H, T, D) layout."""
    return _fused_attention_fwd_impl(q, k, v, block_q=block_q,
                                     interpret=interpret)


def _fwd(q, k, v, block_q, interpret):
    out = _fused_attention_fwd_impl(q, k, v, block_q=block_q,
                                    interpret=interpret)
    return out, (q, k, v)


def _bwd(block_q, interpret, res, g):
    q, k, v = res
    # recomputation backward through the reference formulation; XLA fuses
    _, vjp = jax.vjp(_reference_attention, q, k, v)
    return vjp(g)


fused_attention.defvjp(_fwd, _bwd)


def attention(q, k, v, *, use_pallas: bool | None = None,
              block_q: int = 256) -> jnp.ndarray:
    """Dispatcher: Pallas kernel on TPU, einsum elsewhere.

    q, k, v: (B, H, T, D). Pallas path requires T % 128 == 0 and D >= 64
    alignment; anything else falls back to the XLA path.
    """
    B, H, T, D = q.shape
    if use_pallas is None:
        use_pallas = (
            jax.default_backend() == "tpu" and T % 128 == 0 and D % 64 == 0
        )
    if use_pallas:
        return fused_attention(q, k, v, min(block_q, T))
    return _reference_attention(q, k, v)
