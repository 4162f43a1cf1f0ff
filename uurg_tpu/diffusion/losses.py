"""Epsilon-prediction losses and the adaptive ("adaga") re-weighting.

Reference semantics (DDPM/functions/losses.py:5-72):
- per-sample loss = sum over (H, W, C) of squared eps error
- batch loss = mean over batch
- adaptive weighting: coef_i = 1 / (loss_i^lambda + eps), detached;
  ad_loss_i = coef_i / sum(coef) * loss_i * batch_size

Instead of wrapping a model call (the torch style), the JAX versions are pure
functions of per-sample losses so any workload (classification CE, DDPM eps
loss, DiT VB loss, SD latent MSE) can reuse them — the reference copies this
logic four times (SURVEY.md section 2.6 item 4).
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from uurg_tpu.diffusion.schedules import DiffusionSchedule


def noise_estimation_loss(
    apply_fn: Callable[..., jnp.ndarray],
    schedule: DiffusionSchedule,
    x0: jnp.ndarray,
    t: jnp.ndarray,
    noise: jnp.ndarray,
    *apply_args,
    keepdim: bool = False,
    **apply_kwargs,
) -> jnp.ndarray:
    """eps-MSE loss: ``apply_fn(x_t, t, *args, **kwargs)`` predicts eps.

    ``keepdim=True`` returns the per-sample vector (needed by adaga).
    """
    x_t = schedule.q_sample(x0, t, noise)
    eps_hat = apply_fn(x_t, t, *apply_args, **apply_kwargs)
    per_sample = jnp.sum(
        jnp.square(noise - eps_hat), axis=tuple(range(1, x0.ndim))
    )
    return per_sample if keepdim else per_sample.mean()


def adaptive_weights(per_sample_loss: jnp.ndarray, lambd: float,
                     eps: float = 1e-8) -> jnp.ndarray:
    """Detached normalized inverse-power weights (sum to batch size)."""
    coef = 1.0 / (
        jnp.power(jax.lax.stop_gradient(per_sample_loss), lambd) + eps
    )
    return coef / coef.sum() * per_sample_loss.shape[0]


def adaptive_loss(per_sample_loss: jnp.ndarray, lambd: float,
                  eps: float = 1e-8, keepdim: bool = False) -> jnp.ndarray:
    """adaga loss from a per-sample loss vector.

    NOTE the reference uses eps=1e-8 in DDPM (functions/losses.py:63) but
    eps=1e-15 in Classification/DiT (sfron.py:57, forget.py:43); pass eps
    accordingly.
    """
    ad = adaptive_weights(per_sample_loss, lambd, eps) * per_sample_loss
    return ad if keepdim else ad.mean()


def cosine_alpha_decay(base: float, step, total: int):
    """Cosine decay of forget_alpha: base*(1+cos(pi*step/total))/2
    (DDPM/functions/losses.py:71-72)."""
    return base * (1.0 + jnp.cos(jnp.pi * step / total)) / 2.0


def linear_alpha_decay(base: float, step, total: int, power: float = 1.0):
    """(1 - step/total)^power decay (Classification/unlearn/sfron.py:39-43)."""
    return base * jnp.power(1.0 - step / total, power)
