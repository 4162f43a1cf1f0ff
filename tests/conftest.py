"""Test configuration: force an 8-device virtual CPU mesh.

Multi-device sharding (the pjit data-parallel path) is exercised on virtual
CPU devices — the JAX-native way to test collectives without a TPU slice.
Must run before jax is imported anywhere.
"""
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_threefry_partitionable", True)
