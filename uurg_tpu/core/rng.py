"""RNG helpers: antithetic timestep sampling and conditioning-dropout masks.

The reference draws these from torch's global RNG (DDPM/runners/
diffusion.py:1091-1094, DDPM/models/diffusion.py:8-14); here every random
draw threads an explicit ``jax.random`` key so jitted steps stay pure.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def antithetic_timesteps(key: jax.Array, batch: int, num_timesteps: int) -> jnp.ndarray:
    """Sample ``t ~ U[0, T)`` antithetically: draw n//2+1 and mirror as T-1-t.

    Matches DDPM/runners/diffusion.py:1091-1094 (variance reduction for the
    eps-loss estimator).
    """
    half = batch // 2 + 1
    t = jax.random.randint(key, (half,), 0, num_timesteps)
    t = jnp.concatenate([t, num_timesteps - t - 1], axis=0)[:batch]
    return t


def cond_keep_mask(key: jax.Array, batch: int, cond_drop_prob: float) -> jnp.ndarray:
    """Bernoulli keep-mask for classifier-free-guidance label dropout.

    True where the class label is KEPT (reference prob_mask_like,
    DDPM/models/diffusion.py:8-14 with prob = 1 - cond_drop_prob).
    """
    if cond_drop_prob <= 0.0:
        return jnp.ones((batch,), dtype=bool)
    if cond_drop_prob >= 1.0:
        return jnp.zeros((batch,), dtype=bool)
    return jax.random.uniform(key, (batch,)) >= cond_drop_prob


def split_for_step(key: jax.Array, step: jnp.ndarray, num: int):
    """Derive `num` per-step keys from a base key and an integer step."""
    return jax.random.split(jax.random.fold_in(key, step), num)
