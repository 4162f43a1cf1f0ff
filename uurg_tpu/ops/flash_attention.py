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

Backward: a fused Pallas recompute kernel (one pass per q block computing
dq and accumulating dk/dv across sequential grid steps — the score matrix
again never touches HBM); ``use_pallas_bwd=False`` falls back to the
plain-XLA recompute VJP.
"""
from __future__ import annotations

import contextlib
import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# process-wide escape hatch: inside xla_only() the dispatcher never emits a
# Pallas call. Needed when a TPU-shaped program is lowered for a DIFFERENT
# backend (e.g. bench.py costs FLOPs by compiling the same math on the host
# CPU backend — Pallas TPU kernels cannot compile there, and the process
# default_backend() check below cannot see the jit's target backend).
_XLA_ONLY = False


@contextlib.contextmanager
def xla_only():
    """Force the plain-XLA attention path for traces inside this context."""
    global _XLA_ONLY
    prev = _XLA_ONLY
    _XLA_ONLY = True
    try:
        yield
    finally:
        _XLA_ONLY = prev


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


def _attn_bwd_kernel(q_ref, k_ref, v_ref, g_ref, dq_ref, dk_ref, dv_ref,
                     *, scale: float):
    """Per (batch*head, q-block) step: recompute the softmax rows for this
    q block, emit dq, and ACCUMULATE dk/dv into full-T output blocks that
    every q-block iteration revisits (TPU grids run sequentially, so the
    read-modify-write is race-free)."""
    i = pl.program_id(1)
    q = q_ref[0]                      # (Bq, D)
    k = k_ref[0]                      # (T, D)
    v = v_ref[0]                      # (T, D)
    g = g_ref[0]                      # (Bq, D)

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale      # (Bq, T)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    p = p / jnp.sum(p, axis=-1, keepdims=True)           # fp32 softmax

    gf = g.astype(jnp.float32)
    dp = jax.lax.dot_general(
        gf, v.astype(jnp.float32), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)              # (Bq, T)
    delta = jnp.sum(p * dp, axis=-1, keepdims=True)      # (Bq, 1)
    ds = p * (dp - delta) * scale                        # (Bq, T)

    dq = jax.lax.dot_general(
        ds.astype(k.dtype), k, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dq_ref[0] = dq.astype(dq_ref.dtype)

    dk_blk = jax.lax.dot_general(                        # (T, D)
        ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dv_blk = jax.lax.dot_general(                        # (T, D)
        p.astype(g.dtype), g, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(i == 0)
    def _init():
        dk_ref[0] = dk_blk.astype(dk_ref.dtype)
        dv_ref[0] = dv_blk.astype(dv_ref.dtype)

    @pl.when(i > 0)
    def _acc():
        dk_ref[0] += dk_blk.astype(dk_ref.dtype)
        dv_ref[0] += dv_blk.astype(dv_ref.dtype)


def _fused_attention_bwd_impl(q, k, v, g, *, block_q: int, interpret: bool):
    B, H, T, D = q.shape
    scale = D ** -0.5
    bh = B * H
    qf, kf, vf, gf = (x.reshape(bh, T, D) for x in (q, k, v, g))
    block_q = min(block_q, T)
    if T >= 4096:
        # the bwd kernel holds four (block_q, T) fp32 temps (s, p, dp, ds)
        # plus fp32 k/v casts and the dk/dv accumulators; at T=4096 and
        # block_q=128 that lands 48KB over the 16MB VMEM scope (measured:
        # SD-860M step compile OOM) — halve the q block only here, the fwd
        # kernel's footprint is fine
        block_q = min(block_q, 64)
    grid = (bh, pl.cdiv(T, block_q))

    qspec = pl.BlockSpec((1, block_q, D), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM)
    full = pl.BlockSpec((1, T, D), lambda b, i: (b, 0, 0),
                        memory_space=pltpu.VMEM)
    dq, dk, dv = pl.pallas_call(
        functools.partial(_attn_bwd_kernel, scale=scale),
        grid=grid,
        in_specs=[qspec, full, full, qspec],
        out_specs=[qspec, full, full],
        out_shape=[
            jax.ShapeDtypeStruct((bh, T, D), q.dtype),
            jax.ShapeDtypeStruct((bh, T, D), jnp.float32),
            jax.ShapeDtypeStruct((bh, T, D), jnp.float32),
        ],
        interpret=interpret,
    )(qf, kf, vf, gf)
    return (dq.reshape(B, H, T, D),
            dk.reshape(B, H, T, D).astype(k.dtype),
            dv.reshape(B, H, T, D).astype(v.dtype))


def _fwd(q, k, v, block_q, interpret):
    out = _fused_attention_fwd_impl(q, k, v, block_q=block_q,
                                    interpret=interpret)
    return out, (q, k, v)


def _bwd(block_q, interpret, res, g):
    q, k, v = res
    return _fused_attention_bwd_impl(q, k, v, g, block_q=block_q,
                                     interpret=interpret)


fused_attention.defvjp(_fwd, _bwd)


def attention(q, k, v, *, use_pallas: bool | None = None,
              block_q: int = 256, interpret: bool = False) -> jnp.ndarray:
    """Dispatcher: Pallas kernel on TPU, einsum elsewhere.

    q, k, v: (B, H, T, D). Pallas path requires T % 128 == 0; a head dim
    that is not 64-lane aligned (SD UNet: D = 40/80/160) is zero-padded to
    the next multiple of 64 — padded k columns contribute zero scores,
    padded v columns are sliced off, and q is pre-scaled by sqrt(Dp/D) so
    the kernel's padded-D softmax scale equals the true D**-0.5. Off-TPU
    (or T not 128-aligned, e.g. CLIP's 77 tokens) falls back to XLA.
    """
    B, H, T, D = q.shape
    # sequence-parallel context (parallel/sequence.py): tokens sharded over
    # a mesh axis, ring attention instead of the single-chip kernel
    from uurg_tpu.parallel.sequence import (active_sequence_parallel,
                                            ring_attention)
    sp = active_sequence_parallel()
    if sp is not None:
        mesh, axis, batch_axis = sp
        # BOTH token axes must divide by the seq axis: cross-attention K/V
        # (e.g. 77 CLIP tokens vs T_q=4096 SD latents) falls back to the
        # local kernel rather than failing the k/v shard placement
        if T % mesh.shape[axis] == 0 and k.shape[2] % mesh.shape[axis] == 0:
            return ring_attention(q, k, v, mesh=mesh, axis=axis,
                                  batch_axis=batch_axis)
    if use_pallas is None:
        use_pallas = (not _XLA_ONLY and jax.default_backend() == "tpu"
                      and T % 128 == 0)
    if _XLA_ONLY:
        use_pallas = False
    if not use_pallas:
        return _reference_attention(q, k, v)
    # keep the bwd kernel's fp32 (block_q, T) temps inside VMEM at long T
    if T >= 4096:
        block_q = min(block_q, 128)
    Dp = -(-D // 64) * 64
    if Dp == D:
        return fused_attention(q, k, v, min(block_q, T), interpret)
    pad = [(0, 0)] * 3 + [(0, Dp - D)]
    q = jnp.pad(q * jnp.asarray((Dp / D) ** 0.5, q.dtype), pad)
    k = jnp.pad(k, pad)
    v = jnp.pad(v, pad)
    return fused_attention(q, k, v, min(block_q, T), interpret)[..., :D]
