"""PRNG implementation selection.

JAX's default threefry2x32 is computed on the VPU and is expensive inside
training steps that draw large random tensors (dropout masks, noise):
on the DDPM SFR-on bench it costs ~20% of the step. XLA's hardware
``rbg`` generator removes nearly all of it (measured 10.1 -> 12.4 steps/s
on one TPU chip, matching the dropout-free ceiling of 12.75).

Trade-off (documented, not hidden): rbg draws a different (equally valid)
random stream than threefry for the same seed, and its bits are not
guaranteed stable across different sharding layouts — acceptable for
training stochasticity (reference RNG parity is statistical anyway,
SURVEY.md section 7 hard-part 3), wrong for anything that must reproduce
bit-exactly across topologies. Tests keep the JAX default.
"""
from __future__ import annotations

import jax


def configure_rng(impl: str = "auto") -> str:
    """Set the global PRNG implementation.

    ``auto`` -> ``rbg`` on TPU backends, JAX default elsewhere.
    Returns the implementation chosen.
    """
    if impl == "auto":
        impl = "rbg" if jax.default_backend() == "tpu" else "threefry2x32"
    if impl != "threefry2x32":
        jax.config.update("jax_default_prng_impl", impl)
    return impl
