"""Timestep schedule samplers: uniform and loss-second-moment resampling.

Reference surface: DiT/diffusion/timestep_sampler.py:13-150 (ADM's
ScheduleSampler / UniformSampler / LossSecondMomentResampler).  The
reference keeps numpy state on the host and resamples with np.random.choice;
rank synchronization is a pair of torch.distributed.all_gather calls
(timestep_sampler.py:72-103) so every worker applies the GLOBAL batch of
(t, loss) pairs and the replicated state stays identical.

TPU-native design: the sampler state is a jit-carried pytree
(``LossSecondMomentState``) so sampling, the training step, and the history
update live inside ONE compiled program — no host round-trip per step.
Under pjit over a mesh the update already sees the global batch (XLA inserts
the gathers implied by the sharded scatter), which subsumes the reference's
explicit all_gather; for shard_map code, ``update_with_local_losses`` does
the `jax.lax.all_gather` explicitly (SURVEY §2.5 "Gradient sync in
loss-aware timestep sampler").

Semantics parity notes:
  - weights are uniform until EVERY timestep has ``history_per_term``
    recorded losses, then sqrt(E[loss^2]) mixed with ``uniform_prob`` mass
    (timestep_sampler.py:130-137);
  - importance weights are 1 / (T * p[t]) so the weighted objective is an
    unbiased estimate of the uniform-t objective (timestep_sampler.py:53-58);
  - the per-(t, loss) ring-buffer update is order-sequential, so duplicate
    timesteps within a batch shift the buffer exactly like the reference's
    python loop (timestep_sampler.py:139-147).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class LossSecondMomentState(NamedTuple):
    """Jit-carried resampler state: a (T, K) loss ring buffer + fill counts."""

    history: jax.Array  # (T, K) float32
    counts: jax.Array   # (T,)   int32


def init_loss_second_moment(num_timesteps: int,
                            history_per_term: int = 10
                            ) -> LossSecondMomentState:
    """Empty history (timestep_sampler.py:121-128 defaults)."""
    return LossSecondMomentState(
        history=jnp.zeros((num_timesteps, history_per_term), jnp.float32),
        counts=jnp.zeros((num_timesteps,), jnp.int32))


def sampler_weights(state: LossSecondMomentState,
                    uniform_prob: float = 0.001) -> jax.Array:
    """Normalized sampling distribution over timesteps.

    Uniform until warmed up (every t has a full history), then
    sqrt(mean(history^2)) renormalized and mixed with ``uniform_prob``
    uniform mass (timestep_sampler.py:130-137).
    """
    T, K = state.history.shape
    warmed = jnp.all(state.counts >= K)
    w = jnp.sqrt(jnp.mean(jnp.square(state.history), axis=-1))
    w = w / jnp.maximum(jnp.sum(w), 1e-12)
    w = w * (1.0 - uniform_prob) + uniform_prob / T
    return jnp.where(warmed, w, jnp.full((T,), 1.0 / T))


def sample_timesteps(state: LossSecondMomentState, key: jax.Array,
                     batch: int, uniform_prob: float = 0.001
                     ) -> tuple[jax.Array, jax.Array]:
    """Importance-sample a batch of timesteps.

    Returns ``(t, w)`` with ``w = 1 / (T * p[t])`` so that
    ``mean(w * loss(t))`` is unbiased for the uniform-t loss
    (timestep_sampler.py:44-59).
    """
    p = sampler_weights(state, uniform_prob)
    t = jax.random.categorical(key, jnp.log(p), shape=(batch,))
    w = 1.0 / (p.shape[0] * p[t])
    return t, w


def update_with_all_losses(state: LossSecondMomentState, t: jax.Array,
                           losses: jax.Array) -> LossSecondMomentState:
    """Fold a (global) batch of per-sample losses into the ring buffer.

    Sequential over the batch (lax.fori_loop) so duplicate timesteps shift
    the buffer in order, exactly matching the reference python loop
    (timestep_sampler.py:139-147).  O(batch) scalar scatters — negligible
    next to the model step it rides in.
    """
    K = state.history.shape[1]

    def body(i, carry):
        h, c = carry
        ti = t[i]
        li = losses[i].astype(h.dtype)
        row = jax.lax.dynamic_slice(h, (ti, 0), (1, K))[0]
        full = c[ti] >= K
        row = jnp.where(full, jnp.roll(row, -1), row)
        idx = jnp.where(full, K - 1, c[ti])
        row = row.at[idx].set(li)
        h = jax.lax.dynamic_update_slice(h, row[None], (ti, 0))
        c = c.at[ti].add(jnp.where(full, 0, 1))
        return h, c

    h, c = jax.lax.fori_loop(0, t.shape[0], body,
                             (state.history, state.counts))
    return LossSecondMomentState(h, c)


def update_with_local_losses(state: LossSecondMomentState, t: jax.Array,
                             losses: jax.Array, axis_name: str
                             ) -> LossSecondMomentState:
    """shard_map variant: all_gather the per-device batches first so every
    device applies the identical global update (the reference's
    dist.all_gather sync, timestep_sampler.py:72-103, as an XLA collective).

    Under plain pjit this is unnecessary — scatter on replicated state with
    sharded indices already has global semantics — use
    :func:`update_with_all_losses` there.
    """
    t_all = jax.lax.all_gather(t, axis_name).reshape(-1)
    l_all = jax.lax.all_gather(losses, axis_name).reshape(-1)
    return update_with_all_losses(state, t_all, l_all)


def uniform_timesteps(key: jax.Array, batch: int, num_timesteps: int
                      ) -> tuple[jax.Array, jax.Array]:
    """UniformSampler equivalent (timestep_sampler.py:62-68): every weight
    1/T, so the importance weights are identically 1."""
    t = jax.random.randint(key, (batch,), 0, num_timesteps)
    return t, jnp.ones((batch,), jnp.float32)
