"""DDIM / DDPM samplers as ``lax.scan`` loops.

Reference: DDPM/functions/denoising.py (python loops that offload every
intermediate to CPU). Here the whole reverse process is one compiled scan —
no host round-trips, static timestep sequences, donated carry — and
classifier-free guidance runs as a single batched double-forward instead of
two sequential model calls (cf. DDPM/models/diffusion.py:340-355).
"""
from __future__ import annotations

from typing import Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from uurg_tpu.diffusion.schedules import DiffusionSchedule

# model_fn(x_t, t_int_vector) -> eps prediction, conditioning closed over.
ModelFn = Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray]


def make_step_sequence(num_timesteps: int, num_steps: int,
                       kind: str = "uniform", offset: int = 0) -> np.ndarray:
    """Sub-sequence of timesteps for accelerated sampling (ascending).

    ``uniform`` matches DDPM/runners/diffusion.py skip = T // timesteps,
    seq = range(0, T, skip); ``quad`` is the quadratic spacing variant.
    ``offset=1`` reproduces the LDM convention (SD/ldm/modules/
    diffusionmodules/util.py make_ddim_timesteps adds +1 "to get the final
    alpha values right"), giving 1, 1+skip, ... instead of 0, skip, ...
    """
    if kind == "uniform":
        skip = num_timesteps // num_steps
        seq = np.arange(0, num_timesteps, skip)
    elif kind == "quad":
        seq = (np.linspace(0, np.sqrt(num_timesteps * 0.8), num_steps) ** 2)
        seq = seq.astype(int)
    else:
        raise NotImplementedError(kind)
    return seq + offset


def _seq_pairs(seq: Sequence[int]) -> tuple[np.ndarray, np.ndarray]:
    """(t, t_next) pairs in sampling (descending) order, t_next[-1] = -1."""
    seq = np.asarray(seq, dtype=np.int32)
    seq_next = np.concatenate([[-1], seq[:-1]]).astype(np.int32)
    return seq[::-1].copy(), seq_next[::-1].copy()


def ddim_sample(
    model_fn: ModelFn,
    schedule: DiffusionSchedule,
    x_init: jnp.ndarray,
    seq: Sequence[int],
    *,
    eta: float = 0.0,
    key: jax.Array | None = None,
) -> jnp.ndarray:
    """Generalized (DDIM) sampling, eta in [0, 1].

    Parity target: DDPM/functions/denoising.py:10-33 / 72-95.
    """
    ts, ts_next = _seq_pairs(seq)
    if eta != 0.0 and key is None:
        raise ValueError("eta > 0 requires a PRNG key")
    key = key if key is not None else jax.random.key(0)
    n = x_init.shape[0]
    bshape = (-1,) + (1,) * (x_init.ndim - 1)

    def body(x, step_in):
        t_scalar, t_next_scalar, k = step_in
        t_vec = jnp.full((n,), t_scalar, jnp.int32)
        at = schedule.alpha_bar_padded(t_scalar).reshape(bshape)
        at_next = schedule.alpha_bar_padded(t_next_scalar).reshape(bshape)
        et = model_fn(x, t_vec)
        x0_t = (x - et * jnp.sqrt(1.0 - at)) / jnp.sqrt(at)
        c1 = eta * jnp.sqrt((1 - at / at_next) * (1 - at_next) / (1 - at))
        c2 = jnp.sqrt((1.0 - at_next) - c1**2)
        noise = jax.random.normal(k, x.shape, x.dtype) if eta != 0.0 else 0.0
        x_next = jnp.sqrt(at_next) * x0_t + c1 * noise + c2 * et
        return x_next, None

    keys = jax.random.split(key, len(ts))
    x, _ = jax.lax.scan(body, x_init, (jnp.asarray(ts), jnp.asarray(ts_next), keys))
    return x


def ddpm_sample(
    model_fn: ModelFn,
    schedule: DiffusionSchedule,
    x_init: jnp.ndarray,
    seq: Sequence[int],
    *,
    key: jax.Array,
) -> jnp.ndarray:
    """Ancestral sampling with x0-clamping.

    Parity target: DDPM/functions/denoising.py:36-69 / 98-131 (beta_t derived
    from the respaced alpha ratio, fixedlarge logvar, no noise at t == 0).
    """
    ts, ts_next = _seq_pairs(seq)
    n = x_init.shape[0]
    bshape = (-1,) + (1,) * (x_init.ndim - 1)

    def body(x, step_in):
        t_scalar, t_next_scalar, k = step_in
        t_vec = jnp.full((n,), t_scalar, jnp.int32)
        at = schedule.alpha_bar_padded(t_scalar).reshape(bshape)
        atm1 = schedule.alpha_bar_padded(t_next_scalar).reshape(bshape)
        beta_t = 1.0 - at / atm1
        e = model_fn(x, t_vec)
        x0 = jnp.sqrt(1.0 / at) * x - jnp.sqrt(1.0 / at - 1.0) * e
        x0 = jnp.clip(x0, -1.0, 1.0)
        mean = (
            jnp.sqrt(atm1) * beta_t * x0
            + jnp.sqrt(1.0 - beta_t) * (1.0 - atm1) * x
        ) / (1.0 - at)
        noise = jax.random.normal(k, x.shape, x.dtype)
        nonzero = (t_scalar > 0).astype(x.dtype)
        sample = mean + nonzero * jnp.exp(0.5 * jnp.log(beta_t)) * noise
        return sample, None

    keys = jax.random.split(key, len(ts))
    x, _ = jax.lax.scan(body, x_init, (jnp.asarray(ts), jnp.asarray(ts_next), keys))
    return x


def cfg_model_fn(
    apply_fn: Callable[..., jnp.ndarray],
    labels: jnp.ndarray,
    cond_scale: float,
) -> ModelFn:
    """Classifier-free guidance as ONE batched double-forward.

    ``apply_fn(x, t, c, cond_keep)`` must honor a boolean per-sample
    keep-mask selecting the null class embedding when False. Output is
    ``(1 + s) * cond - s * uncond`` (DDPM/models/diffusion.py:340-355).
    """
    def fn(x, t):
        if cond_scale == 0.0:
            keep = jnp.ones_like(labels, dtype=bool)
            return apply_fn(x, t, labels, keep)
        n = x.shape[0]
        x2 = jnp.concatenate([x, x], axis=0)
        t2 = jnp.concatenate([t, t], axis=0)
        c2 = jnp.concatenate([labels, labels], axis=0)
        keep = jnp.concatenate(
            [jnp.ones((n,), bool), jnp.zeros((n,), bool)], axis=0
        )
        out = apply_fn(x2, t2, c2, keep)
        cond, uncond = out[:n], out[n:]
        return (1.0 + cond_scale) * cond - cond_scale * uncond

    return fn
