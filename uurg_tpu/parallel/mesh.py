"""Device mesh and sharding helpers.

The reference's distributed story is torch DataParallel scatter/gather
(DDPM/runners/diffusion.py:110, DiT/forget.py:193) plus one NCCL DDP script
(DiT/sample_ddp.py:54-60). The TPU-native replacement: a ``jax.sharding.Mesh``
with the batch sharded over a ``data`` axis and (optionally) parameters
sharded FSDP-style over a ``model`` axis; pjit inserts the psum/all-gather
collectives over ICI, so there is no hand-written communication anywhere.
"""
from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

PyTree = Any


def make_mesh(axis_sizes: dict[str, int] | None = None,
              devices: Sequence | None = None) -> Mesh:
    """Create a mesh. Default: 1-D data-parallel over all devices.

    ``axis_sizes`` e.g. {"data": 4, "model": 2}; -1 means "fill with the
    remaining devices".
    """
    devices = list(devices if devices is not None else jax.devices())
    if not axis_sizes:
        axis_sizes = {"data": len(devices)}
    names = list(axis_sizes)
    sizes = list(axis_sizes.values())
    if -1 in sizes:
        known = int(np.prod([s for s in sizes if s != -1]))
        sizes[sizes.index(-1)] = len(devices) // known
    total = int(np.prod(sizes))
    if total > len(devices):
        raise ValueError(
            f"mesh axes {dict(zip(names, sizes))} need {total} devices, "
            f"only {len(devices)} available")
    if total < len(devices):
        import warnings

        warnings.warn(
            f"mesh axes {dict(zip(names, sizes))} use {total} of "
            f"{len(devices)} devices; use -1 on one axis to fill the rest",
            stacklevel=2)
    mesh_devices = np.asarray(devices[:total]).reshape(sizes)
    return Mesh(mesh_devices, tuple(names))


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Sharding for batch-leading arrays: first dim over the data axis."""
    return NamedSharding(mesh, P(axis))


def replicate(tree: PyTree, mesh: Mesh) -> PyTree:
    """Fully replicate a pytree across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def shard_batch(batch: PyTree, mesh: Mesh, axis: str = "data") -> PyTree:
    """Shard every array in the batch along its leading dim."""
    sharding = batch_sharding(mesh, axis)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(jnp.asarray(x), sharding), batch
    )


def fsdp_spec(shape: tuple, axis: str, axis_size: int,
              min_size: int = 2**14) -> P:
    """FSDP-style partition spec: shard the largest divisible dim of a
    parameter over ``axis``; replicate small or indivisible params."""
    if not shape or int(np.prod(shape)) < min_size:
        return P()
    dims = sorted(range(len(shape)), key=lambda i: -shape[i])
    for d in dims:
        if shape[d] % axis_size == 0:
            spec = [None] * len(shape)
            spec[d] = axis
            return P(*spec)
    return P()


def shard_params_fsdp(params: PyTree, mesh: Mesh, axis: str = "model",
                      min_size: int = 2**14) -> PyTree:
    """Place params with FSDP-style sharding over ``axis``; returns the
    sharded pytree. Use the matching specs (via ``fsdp_param_specs``) as
    jit in_shardings so XLA all-gathers weights just-in-time per layer."""
    axis_size = mesh.shape[axis]
    return jax.tree_util.tree_map(
        lambda p: jax.device_put(
            p, NamedSharding(mesh, fsdp_spec(p.shape, axis, axis_size,
                                             min_size))),
        params,
    )


def fsdp_param_specs(params: PyTree, mesh: Mesh, axis: str = "model",
                     min_size: int = 2**14) -> PyTree:
    axis_size = mesh.shape[axis]
    return jax.tree_util.tree_map(
        lambda p: fsdp_spec(p.shape, axis, axis_size, min_size), params
    )
