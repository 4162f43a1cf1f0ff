"""Beta schedules and precomputed diffusion constants.

Numerics mirror DDPM/runners/diffusion.py:36-99 (schedules built in float64
then cast, alphas_cumprod/posterior/logvar precomputed once); stored as a
pytree so the whole schedule rides into jit as constants.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np


def get_beta_schedule(
    beta_schedule: str,
    *,
    beta_start: float,
    beta_end: float,
    num_diffusion_timesteps: int,
) -> np.ndarray:
    """Supported: linear | quad | const | jsd | sigmoid (reference parity)."""
    T = num_diffusion_timesteps
    if beta_schedule == "quad":
        betas = np.linspace(beta_start**0.5, beta_end**0.5, T, dtype=np.float64) ** 2
    elif beta_schedule == "linear":
        betas = np.linspace(beta_start, beta_end, T, dtype=np.float64)
    elif beta_schedule == "const":
        betas = beta_end * np.ones(T, dtype=np.float64)
    elif beta_schedule == "jsd":
        betas = 1.0 / np.linspace(T, 1, T, dtype=np.float64)
    elif beta_schedule == "sigmoid":
        x = np.linspace(-6, 6, T)
        betas = 1.0 / (1.0 + np.exp(-x)) * (beta_end - beta_start) + beta_start
    else:
        raise NotImplementedError(beta_schedule)
    assert betas.shape == (T,)
    return betas


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class DiffusionSchedule:
    """All per-timestep constants needed by losses and samplers."""

    betas: jnp.ndarray                 # (T,)
    alphas_cumprod: jnp.ndarray        # (T,)
    logvar: jnp.ndarray                # (T,) fixedlarge/fixedsmall sampling logvar

    @property
    def num_timesteps(self) -> int:
        return self.betas.shape[0]

    def alpha_bar(self, t: jnp.ndarray) -> jnp.ndarray:
        """alphas_cumprod gathered at integer timesteps ``t`` (any shape)."""
        return self.alphas_cumprod[t]

    def alpha_bar_padded(self, t: jnp.ndarray) -> jnp.ndarray:
        """``compute_alpha`` semantics (DDPM/functions/denoising.py:4-7):
        a prepended 1 so t = -1 yields alpha_bar = 1."""
        padded = jnp.concatenate([jnp.ones((1,), self.alphas_cumprod.dtype),
                                  self.alphas_cumprod])
        return padded[t + 1]

    def q_sample(self, x0: jnp.ndarray, t: jnp.ndarray, noise: jnp.ndarray) -> jnp.ndarray:
        """Forward-process sample x_t = sqrt(abar) x0 + sqrt(1-abar) eps."""
        a = self.alpha_bar(t).reshape((-1,) + (1,) * (x0.ndim - 1))
        return x0 * jnp.sqrt(a) + noise * jnp.sqrt(1.0 - a)


def make_schedule(
    beta_schedule: str = "linear",
    beta_start: float = 1e-4,
    beta_end: float = 2e-2,
    num_diffusion_timesteps: int = 1000,
    var_type: str = "fixedlarge",
    dtype=jnp.float32,
) -> DiffusionSchedule:
    betas64 = get_beta_schedule(
        beta_schedule,
        beta_start=beta_start,
        beta_end=beta_end,
        num_diffusion_timesteps=num_diffusion_timesteps,
    )
    alphas = 1.0 - betas64
    alphas_cumprod = np.cumprod(alphas)
    alphas_cumprod_prev = np.concatenate([[1.0], alphas_cumprod[:-1]])
    posterior_variance = betas64 * (1.0 - alphas_cumprod_prev) / (1.0 - alphas_cumprod)
    if var_type == "fixedlarge":
        logvar = np.log(betas64)
    elif var_type == "fixedsmall":
        logvar = np.log(np.maximum(posterior_variance, 1e-20))
    else:
        raise NotImplementedError(var_type)
    return DiffusionSchedule(
        betas=jnp.asarray(betas64, dtype),
        alphas_cumprod=jnp.asarray(alphas_cumprod, dtype),
        logvar=jnp.asarray(logvar, dtype),
    )
