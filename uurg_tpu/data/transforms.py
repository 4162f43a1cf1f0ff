"""Data-range transforms (DDPM/dataset/__init__.py:241-267 parity).

Images flow host->device as float32 NHWC in [0, 1]; ``data_transform``
rescales to [-1, 1] when the config asks (``rescaled: true``), with optional
uniform/gaussian dequantization.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def data_transform(cfg, x: jnp.ndarray, key: jax.Array | None = None) -> jnp.ndarray:
    d = cfg.data
    if d.get("uniform_dequantization", False):
        if key is None:
            raise ValueError("uniform dequantization needs a PRNG key")
        x = (x * 255.0 + jax.random.uniform(key, x.shape)) / 256.0
    if d.get("gaussian_dequantization", False):
        if key is None:
            raise ValueError("gaussian dequantization needs a PRNG key")
        x = x + jax.random.normal(key, x.shape) * 0.01
    if d.get("rescaled", False):
        x = 2.0 * x - 1.0
    return x


def inverse_data_transform(cfg, x: jnp.ndarray) -> jnp.ndarray:
    if cfg.data.get("rescaled", False):
        x = (x + 1.0) / 2.0
    return jnp.clip(x, 0.0, 1.0)
