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


def parse_mesh_spec(spec: str) -> dict[str, int]:
    """Parse a CLI mesh spec like ``"data=4,model=2"`` (``-1`` fills the
    remaining devices, as in :func:`make_mesh`)."""
    out: dict[str, int] = {}
    for part in spec.split(","):
        part = part.strip()
        if not part:
            continue
        name, _, size = part.partition("=")
        if not _ or not name:
            raise ValueError(f"bad mesh spec {spec!r}: expected name=size "
                             f"pairs, got {part!r}")
        out[name.strip()] = int(size)
    if not out:
        raise ValueError(f"empty mesh spec {spec!r}")
    return out


def _resolve_axis(mesh: Mesh, axis: str) -> str | None:
    """Resolve a preferred axis name against the mesh.

    Missing axes fall back so the documented CLI combinations all work:
    ``--parallelism fsdp`` on a ``data=N`` mesh shards params over ``data``
    (ZeRO over the data axis), and ``--parallelism tp`` on a ``model=N``
    mesh replicates the batch (pure TP). Returns None when the mesh has no
    axis of size > 1 to use.
    """
    if axis in mesh.shape:
        return axis
    best = max(mesh.shape, key=lambda n: mesh.shape[n], default=None)
    if best is None or mesh.shape[best] == 1:
        return None
    return best


def batch_sharding(mesh: Mesh, axis: str = "data",
                   batch_dim: int = 0) -> NamedSharding:
    """Sharding for batch-leading arrays: ``batch_dim`` over the data axis.

    ``batch_dim`` > 0 covers grad-accumulation stacks whose leaves are
    [grad_accum, batch, ...]: the microbatch axis (scanned over INSIDE the
    step, must stay whole per device) is replicated and the true batch axis
    shards — ``batch_dim=1`` gives P(None, 'data').

    On a mesh without a ``data`` axis (pure tensor parallelism, e.g.
    ``--mesh model=8``) the batch is replicated — each chip holds the full
    batch and the sharded params produce sharded activations."""
    if axis not in mesh.shape:
        return NamedSharding(mesh, P())
    return NamedSharding(mesh, P(*([None] * batch_dim), axis))


def replicate(tree: PyTree, mesh: Mesh) -> PyTree:
    """Fully replicate a pytree across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def shard_batch(batch: PyTree, mesh: Mesh, axis: str = "data",
                batch_dim: int = 0) -> PyTree:
    """Shard every array in the batch along its batch dim (default: the
    leading dim; pass ``batch_dim=1`` for grad-accum-stacked batches)."""
    sharding = batch_sharding(mesh, axis, batch_dim)
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
    jit in_shardings so XLA all-gathers weights just-in-time per layer.

    If the mesh has no ``axis``, params shard over the largest mesh axis
    instead (ZeRO over the data axis — the documented ``--mesh data=-1
    --parallelism fsdp`` invocation)."""
    axis = _resolve_axis(mesh, axis)
    if axis is None:
        return jax.device_put(params, NamedSharding(mesh, P()))
    axis_size = mesh.shape[axis]
    return jax.tree_util.tree_map(
        lambda p: jax.device_put(
            p, NamedSharding(mesh, fsdp_spec(p.shape, axis, axis_size,
                                             min_size))),
        params,
    )


def fsdp_param_specs(params: PyTree, mesh: Mesh, axis: str = "model",
                     min_size: int = 2**14) -> PyTree:
    axis = _resolve_axis(mesh, axis)
    if axis is None:
        return jax.tree_util.tree_map(lambda p: P(), params)
    axis_size = mesh.shape[axis]
    return jax.tree_util.tree_map(
        lambda p: fsdp_spec(p.shape, axis, axis_size, min_size), params
    )


# --- tensor parallelism -----------------------------------------------------
#
# Megatron-style TP as rule-based partition specs: column-parallel (shard the
# output-features dim) for qkv/fc1-style projections, row-parallel (shard the
# input-features dim) for proj/fc2-style projections. pjit's SPMD partitioner
# propagates the activation shardings and inserts the reduce at each
# row-parallel matmul over ICI — the hand-written all_reduce of a Megatron
# implementation never appears in user code. This exceeds the reference's
# parallelism surface (torch DataParallel only — SURVEY §2.5 marks TP/PP
# absent); it is what makes >16GB models trainable on a pod slice.
#
# A rule is (path_regex, tail) where ``tail`` names mesh axes for the LAST
# len(tail) dims of a matching param, right-aligned — so the same rules cover
# scan-stacked params (leading depth dim) and plain ones: ("model", None)
# applied to a (depth, Din, Dout) kernel gives P(None, "model", None).

TPRule = tuple[str, tuple]

# DiT blocks (uurg_tpu/models/dit.py DiTBlock): qkv + mlp_fc1 + adaLN
# column-parallel, attn proj + mlp_fc2 row-parallel. Everything outside the
# blocks (embedders, final head) is small and stays replicated.
DIT_TP_RULES: list[TPRule] = [
    (r"attn/qkv/(kernel|bias)$", ("model",)),
    (r"mlp_fc1/(kernel|bias)$", ("model",)),
    (r"adaLN_modulation/(kernel|bias)$", ("model",)),
    (r"attn/proj/kernel$", ("model", None)),
    (r"mlp_fc2/kernel$", ("model", None)),
]

# SD UNet spatial transformers (uurg_tpu/models/sd_unet.py): q/k/v + GEGLU
# column-parallel, to_out + ff_out row-parallel. Convs / norms / embeddings
# fall through (use fallback='fsdp' to scatter those too).
SD_TP_RULES: list[TPRule] = [
    (r"attn[12]/to_[qkv]/kernel$", ("model",)),
    (r"ff_geglu/proj/(kernel|bias)$", ("model",)),
    (r"attn[12]/to_out/kernel$", ("model", None)),
    (r"ff_out/kernel$", ("model", None)),
]


def _path_str(path) -> str:
    parts = []
    for k in path:
        parts.append(getattr(k, "key", getattr(k, "idx", k)))
    return "/".join(str(p) for p in parts)


def tp_param_specs(params: PyTree, mesh: Mesh,
                   rules: Sequence[TPRule] = DIT_TP_RULES,
                   fallback: str = "replicate",
                   fsdp_min_size: int = 2**14) -> PyTree:
    """PartitionSpecs from path-regex rules (first match wins).

    A matched param gets its LAST ``len(tail)`` dims annotated with the
    rule's tail (axes must divide the dim size — otherwise the param falls
    through to ``fallback``). Unmatched params are replicated, or
    FSDP-sharded when ``fallback='fsdp'`` (mixing TP matrices with
    FSDP-scattered residual params over the same axis is sound: both are
    just shardings, pjit reconciles them per-op).
    """
    import re

    rule_axes = {ax for _, tail in rules for ax in tail if ax is not None}
    missing = rule_axes - set(mesh.shape)
    if missing:
        raise ValueError(
            f"tensor-parallel rules shard over mesh axes {sorted(missing)} "
            f"that the mesh {dict(mesh.shape)} does not have — pass e.g. "
            f"--mesh data=-1,model=2 (or use --parallelism fsdp)")
    compiled = [(re.compile(rx), tail) for rx, tail in rules]

    def fb_spec(p) -> P:
        if fallback == "fsdp":
            ax = _resolve_axis(mesh, "model")
            if ax is None:
                return P()
            return fsdp_spec(p.shape, ax, mesh.shape[ax], fsdp_min_size)
        return P()

    def one(path, p) -> P:
        s = _path_str(path)
        for rx, tail in compiled:
            if rx.search(s):
                if len(tail) > len(p.shape):
                    break
                ok = all(
                    ax is None or p.shape[len(p.shape) - len(tail) + i]
                    % mesh.shape[ax] == 0
                    for i, ax in enumerate(tail))
                if not ok:
                    break
                spec = [None] * (len(p.shape) - len(tail)) + list(tail)
                return P(*spec)
        return fb_spec(p)

    return jax.tree_util.tree_map_with_path(one, params)


def shard_params_tp(params: PyTree, mesh: Mesh,
                    rules: Sequence[TPRule] = DIT_TP_RULES,
                    fallback: str = "replicate") -> PyTree:
    """Place params with tensor-parallel sharding per ``tp_param_specs``."""
    specs = tp_param_specs(params, mesh, rules, fallback)
    return jax.tree_util.tree_map(
        lambda p, s: jax.device_put(p, NamedSharding(mesh, s)),
        params, specs)
