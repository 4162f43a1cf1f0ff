"""Pytree utilities shared by the unlearning engine.

These replace the reference's cross-cutting ``named_parameters()`` loops
(Classification/unlearn/sfron.py:202-204, DDPM/runners/diffusion.py:1126-1129,
DiT/forget.py:289-292, SD/train-scripts/nsfw_removal.py:157-160) with single
``jax.tree_util`` expressions that XLA fuses into the surrounding train step.
"""
from __future__ import annotations

import dataclasses
import math
from typing import Any

import jax
import jax.numpy as jnp

PyTree = Any


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class PackedMask:
    """A boolean mask leaf bit-packed 8x (uint8, 1 bit/element).

    A bool saliency mask for DiT-XL/2 is 675MB of HBM; packed it is 84MB.
    ``tree_mul`` unpacks at the multiply site.

    Bit-PLANE layout, not numpy packbits: byte i carries bit b for flat
    element ``b*M + i`` (M = ceil(N/8)). Unpacking is then a ``[8, M]``
    shift-and-mask whose minor dimension is M (huge), followed by a free
    row-major reshape to ``[8*M]`` — measured on v5e, the packbits layout
    ``[M, 8]`` (minor dim 8) tile-pads 16x and one DiT-XL mlp kernel's
    unpack alone allocated 8.86GB of HLO temp (OOM); the plane layout
    pads ~1x."""

    bits: jnp.ndarray                                     # uint8, [M]
    shape: tuple = dataclasses.field(metadata=dict(static=True))

    def unpack(self, dtype=jnp.float32) -> jnp.ndarray:
        n = math.prod(self.shape) if self.shape else 1
        rows = (self.bits[None, :]
                >> jnp.arange(8, dtype=jnp.uint8)[:, None]) & jnp.uint8(1)
        return rows.reshape(-1)[:n].astype(dtype).reshape(self.shape)


def pack_mask(mask: PyTree) -> PyTree:
    """Bit-pack every leaf of a 0/1 (or bool) mask pytree."""

    def _pack_leaf(l):
        import functools

        flat = jnp.ravel(l) != 0
        m = -(-flat.size // 8)  # bytes per plane
        flat = jnp.pad(flat, (0, m * 8 - flat.size))
        planes = flat.reshape(8, m).astype(jnp.uint8)
        byte = functools.reduce(
            jnp.bitwise_or,
            [planes[b] << jnp.uint8(b) for b in range(8)])
        return PackedMask(byte, tuple(l.shape))

    @jax.jit
    def _pack(t):
        return jax.tree_util.tree_map(_pack_leaf, t)

    return _pack(mask)


def tree_mul(a: PyTree, b: PyTree) -> PyTree:
    """Elementwise product of two matching pytrees (e.g. grads * mask).

    ``b`` leaves may be PackedMask nodes (bit-packed saliency masks)."""
    def mul(x, y):
        if isinstance(y, PackedMask):
            return x * y.unpack(x.dtype)
        return x * y.astype(x.dtype)

    return jax.tree_util.tree_map(
        mul, a, b, is_leaf=lambda n: isinstance(n, PackedMask))


def tree_lerp(new: PyTree, old: PyTree, weight_old) -> PyTree:
    """``(1 - w) * new + w * old`` — the EMA/fast-slow mixing primitive.

    Covers all three reference EMA variants (DDPM/models/ema.py:5-51,
    Classification/unlearn/sfron.py:30-37, DiT/forget.py:52-62).
    """
    return jax.tree_util.tree_map(
        lambda n, o: (1.0 - weight_old) * n + weight_old * o, new, old
    )


def global_norm(tree: PyTree) -> jnp.ndarray:
    """L2 norm over every leaf, matching torch.nn.utils.clip_grad_norm_."""
    leaves = jax.tree_util.tree_leaves(tree)
    return jnp.sqrt(sum(jnp.sum(jnp.square(l.astype(jnp.float32))) for l in leaves))


def clip_by_global_norm(tree: PyTree, max_norm: float) -> tuple[PyTree, jnp.ndarray]:
    """Scale the whole tree so its global norm is at most ``max_norm``."""
    norm = global_norm(tree)
    scale = jnp.minimum(1.0, max_norm / (norm + 1e-6))
    return jax.tree_util.tree_map(lambda l: l * scale.astype(l.dtype), tree), norm


def tree_zeros_like(tree: PyTree, dtype=None) -> PyTree:
    return jax.tree_util.tree_map(
        lambda l: jnp.zeros_like(l, dtype=dtype or l.dtype), tree
    )


def _mask_leaves(tree: PyTree):
    return jax.tree_util.tree_leaves(
        tree, is_leaf=lambda n: isinstance(n, PackedMask))


def mask_is_packed(tree: PyTree) -> bool:
    """True if any leaf of ``tree`` is a PackedMask node.

    Runners use this (not their ``pack_mask`` CLI flag) to decide whether
    the mask can be sharded with param PartitionSpecs: a pre-packed mask
    passed by a caller must be skipped regardless of the flag — packed
    bit-planes don't match param shapes."""
    return any(isinstance(l, PackedMask) for l in _mask_leaves(tree))


def tree_size(tree: PyTree) -> int:
    return sum(math.prod(l.shape) if isinstance(l, PackedMask) else l.size
               for l in _mask_leaves(tree))


def tree_count_nonzero(tree: PyTree) -> jnp.ndarray:
    # PackedMask: padding bits are zero, so a popcount over the packed
    # bytes equals the unpacked nonzero count without materializing it
    return sum(
        jnp.sum(jax.lax.population_count(l.bits).astype(jnp.int32))
        if isinstance(l, PackedMask) else jnp.count_nonzero(l)
        for l in _mask_leaves(tree))


def sparsity(tree: PyTree) -> jnp.ndarray:
    """Fraction of exactly-zero entries (reference calc_sparsity,
    Classification/unlearn/sfron.py:19-28)."""
    total = tree_size(tree)
    nz = tree_count_nonzero(tree)
    return 1.0 - nz / total


def tree_cast(tree: PyTree, dtype) -> PyTree:
    return jax.tree_util.tree_map(lambda l: l.astype(dtype), tree)


def tree_add(a: PyTree, b: PyTree) -> PyTree:
    return jax.tree_util.tree_map(jnp.add, a, b)


def tree_scale(tree: PyTree, s) -> PyTree:
    return jax.tree_util.tree_map(lambda l: l * s, tree)


def tree_to_host(tree: PyTree) -> PyTree:
    """Pull a pytree to host numpy with ONE device-to-host transfer.

    ``jax.device_get`` issues a round-trip per leaf; through this
    environment's remote-TPU tunnel the first transfers cost seconds EACH
    (measured: 40 tiny BatchNorm stats = 152 s, while one 11M-param
    transfer right after = 0.8 s). Concatenating on device and splitting on
    host makes it a single round-trip. Also the reason device arrays must
    never be closed into jits as constants: lowering embeds them via the
    same per-leaf reads.
    """
    import numpy as np

    leaves, treedef = jax.tree_util.tree_flatten(tree)
    if not leaves:
        return tree
    shapes = [l.shape for l in leaves]
    dtypes = [l.dtype for l in leaves]
    sizes = [int(np.prod(s)) if s else 1 for s in shapes]
    flat = jnp.concatenate(
        [jnp.ravel(l).astype(jnp.float32) for l in leaves])
    host = np.asarray(flat)  # the single transfer
    parts = np.split(host, np.cumsum(sizes)[:-1])
    rebuilt = [p.reshape(s).astype(d)
               for p, s, d in zip(parts, shapes, dtypes)]
    return jax.tree_util.tree_unflatten(treedef, rebuilt)
