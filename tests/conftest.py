"""Test configuration: force an 8-device virtual CPU mesh.

Multi-device sharding (the pjit data-parallel path) is exercised on virtual
CPU devices — the JAX-native way to test collectives without a TPU slice.

NOTE: this environment's sitecustomize registers an 'axon' TPU plugin and
imports jax before conftest runs, so env vars (JAX_PLATFORMS / XLA_FLAGS)
are too late — we must use jax.config.update, which works because backends
are not yet initialized at conftest time.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_threefry_partitionable", True)
