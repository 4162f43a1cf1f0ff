"""Fisher-diagonal (squared-gradient) accumulation.

The reference implements this four times with host round-trips per batch
(Classification/unlearn/sfron.py:273-320, DDPM/runners/diffusion.py:1236-1364,
DiT/generate_fisher.py:217-291, SD/train-scripts/generate_fisher.py:31-129).
Here it is ONE jitted step — grad, square, accumulate fused on device; under a
data-sharded mesh the batch-gradient mean already includes the cross-device
psum, so no explicit collective is needed.
"""
from __future__ import annotations

from typing import Callable, Iterable

import jax
import jax.numpy as jnp

from uurg_tpu.core import tree as tr

# loss_fn(params, batch, rng) -> scalar
LossFn = Callable[..., jnp.ndarray]


def make_fisher_batch_step(loss_fn: LossFn):
    """Jitted accumulation step: fisher += (d loss/d params)^2.

    Matches the reference semantics of squaring the *batch-mean* gradient
    (not per-sample grads) — e.g. DDPM/runners/diffusion.py:1265-1281.
    """

    @jax.jit
    def step(fisher, params, batch, rng):
        grads = jax.grad(loss_fn)(params, batch, rng)
        return jax.tree_util.tree_map(
            lambda f, g: f + jnp.square(g.astype(f.dtype)), fisher, grads
        )

    return step


def accumulate_fisher(
    loss_fn: LossFn,
    params,
    batches: Iterable,
    key: jax.Array,
    *,
    num_batches: int | None = None,
    dtype=jnp.float32,
):
    """Average squared batch gradients over a data stream.

    Returns the Fisher-diagonal pytree (same structure as ``params``).
    The reference divides by len(loader) inside the loop; dividing once at
    the end is numerically identical and saves a multiply per leaf per batch.
    """
    step = make_fisher_batch_step(loss_fn)
    fisher = tr.tree_zeros_like(params, dtype=dtype)
    n = 0
    for batch in batches:
        key, sub = jax.random.split(key)
        fisher = step(fisher, params, batch, sub)
        n += 1
        if num_batches is not None and n >= num_batches:
            break
    if n == 0:
        raise ValueError("accumulate_fisher received no batches")
    return tr.tree_scale(fisher, 1.0 / n)


def make_per_sample_fisher_step(per_sample_loss_fn: LossFn):
    """Per-sample Fisher via vmap(grad) — the TPU answer to the reference's
    sequential ``loss[i].backward(retain_graph=True)`` trick
    (DDPM/runners/diffusion.py:264-344, SA-FIM).

    ``per_sample_loss_fn(params, example, rng) -> scalar`` for ONE example;
    the step maps it over the batch and accumulates mean-of-squares.
    """

    @jax.jit
    def step(fisher, params, batch, rngs):
        grads = jax.vmap(
            lambda ex, r: jax.grad(per_sample_loss_fn)(params, ex, r)
        )(batch, rngs)
        sq_mean = jax.tree_util.tree_map(
            lambda g: jnp.mean(jnp.square(g.astype(jnp.float32)), axis=0), grads
        )
        return jax.tree_util.tree_map(jnp.add, fisher, sq_mean)

    return step
