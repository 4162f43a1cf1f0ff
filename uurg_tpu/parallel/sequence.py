"""Sequence (context) parallelism: ring attention over a ``seq`` mesh axis.

The reference has no sequence parallelism (torch DataParallel only —
SURVEY.md §2.5); this is beyond-reference capability for long token counts
(the SD UNet's 64x64-latent self-attention is T=4096; DiT at 512px is
T=1024). TPU-native shape:

- activations shard along the TOKEN axis over a ``seq`` mesh axis, so
  per-chip activation memory and attention FLOPs both divide by the axis
  size;
- each chip holds its own q/k/v token shard; k/v shards rotate around the
  ring with one ``lax.ppermute`` neighbour hop per step (S steps total)
  while the local q block accumulates its attention output with the online
  (flash-style) softmax update — the full T x T score matrix never exists,
  on any chip;
- the update is order-invariant, so every chip seeing the k/v shards in a
  different rotation order still produces exactly softmax(qk^T)v;
- everything is inside one ``shard_map`` and differentiable (ppermute
  transposes to the reverse rotation), so training steps jit through it.

Scores/accumulators run in fp32 (same discipline as ops/flash_attention);
the k/v chunk matmuls stay in the input dtype on the MXU.
"""
from __future__ import annotations

import contextlib

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

_ACTIVE_SP: list[tuple] = []


@contextlib.contextmanager
def sequence_parallel(mesh: Mesh, axis: str = "seq",
                      batch_axis: str = "data"):
    """Route every uurg_tpu attention call traced inside this context
    through :func:`ring_attention` (models call the
    ops.flash_attention.attention dispatcher, which consults this).

    Trace-time state: enter the context around the step CALLS so the first
    trace of each jitted step happens inside it (recompilation outside the
    context falls back to the single-chip kernel)."""
    _ACTIVE_SP.append((mesh, axis, batch_axis))
    try:
        yield
    finally:
        _ACTIVE_SP.pop()


def active_sequence_parallel() -> tuple | None:
    return _ACTIVE_SP[-1] if _ACTIVE_SP else None


def ring_attention(q, k, v, *, mesh: Mesh, axis: str = "seq",
                   batch_axis: str = "data"):
    """Exact softmax attention with q/k/v sharded along tokens.

    Args:
      q, k, v: (B, H, T, D); T must divide by the ``axis`` size. Inputs
        may live replicated or already T-sharded — shard_map repartitions.
      mesh: mesh holding ``axis`` (and optionally ``batch_axis``; if
        present, B additionally shards over it — dp x sp composition).

    Returns (B, H, T, D), sharded like q.
    """
    S = mesh.shape[axis]
    T = q.shape[2]
    if T % S:
        raise ValueError(f"token count {T} not divisible by seq axis {S}")
    scale = q.shape[-1] ** -0.5
    perm = [(i, (i + 1) % S) for i in range(S)]

    def local(q, k, v):
        qf = q.astype(jnp.float32) * scale

        def step(carry, _):
            k_c, v_c, m, l, acc = carry
            s = jnp.einsum("bhqd,bhkd->bhqk", qf, k_c.astype(jnp.float32))
            m_new = jnp.maximum(m, s.max(-1))
            p = jnp.exp(s - m_new[..., None])
            corr = jnp.exp(m - m_new)
            l = l * corr + p.sum(-1)
            acc = acc * corr[..., None] + jnp.einsum(
                "bhqk,bhkd->bhqd", p, v_c.astype(jnp.float32))
            k_c = jax.lax.ppermute(k_c, axis, perm)
            v_c = jax.lax.ppermute(v_c, axis, perm)
            return (k_c, v_c, m_new, l, acc), None

        B, H, Tq, D = q.shape
        init = (k, v,
                jnp.full((B, H, Tq), -jnp.inf, jnp.float32),
                jnp.zeros((B, H, Tq), jnp.float32),
                jnp.zeros((B, H, Tq, D), jnp.float32))
        (_, _, _, l, acc), _ = jax.lax.scan(step, init, None, length=S)
        return (acc / l[..., None]).astype(q.dtype)

    b_ax = batch_axis if batch_axis in mesh.shape else None
    spec = P(b_ax, None, axis, None)
    return jax.shard_map(local, mesh=mesh, in_specs=(spec,) * 3,
                         out_specs=spec, check_vma=False)(q, k, v)
