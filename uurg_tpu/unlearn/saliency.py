"""Weight-saliency masks: Fisher-ratio (SFR-on) and global top-k (SalUn).

Parity targets:
- ratio mask: (F_forget + eps) / (F_remain + eps) >= threshold, built four
  times in the reference (Classification/unlearn/sfron.py:322-336,
  DDPM/generate_fisher_mask.py:37-48, DiT/generate_mask.py:30-46,
  SD/train-scripts/generate_fisher_mask.py:38-48).
- top-k mask: global rank of |forget grad| (Classification/unlearn/
  salun.py:163-195, DDPM/runners/diffusion.py:995-1036) — realized here as a
  global threshold from a single device-side sort instead of the reference's
  double-argsort ranking (identical mask up to ties).

Masks are stored as float32 0/1 pytrees: multiplying gradients by a float
mask fuses into the update; a bool tree would force casts inside the hot
step. (For 675M-param DiT masks this costs 2.7GB HBM; `pack_mask` /
`unpack_mask` provide 1-bit storage for checkpointing.)
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from uurg_tpu.core import tree as tr


def fisher_ratio_mask(forget_fisher, remain_fisher, threshold: float,
                      eps: float = 1e-15):
    """Boolean saliency mask as float32 0/1 pytree."""
    return jax.tree_util.tree_map(
        lambda f, r: ((f + eps) / (r + eps) >= threshold).astype(jnp.float32),
        forget_fisher, remain_fisher,
    )


def topk_saliency_mask(grad_tree, ratio: float):
    """1 where |g| is in the global top ``ratio`` fraction, else 0.

    Equivalent to the reference's argsort-of-argsort ranking: an element is
    selected iff its |g| is >= the (k-th largest) global threshold.
    """
    leaves, treedef = jax.tree_util.tree_flatten(grad_tree)
    flat = jnp.concatenate([jnp.abs(l.astype(jnp.float32)).ravel()
                            for l in leaves])
    total = flat.shape[0]
    k = int(total * ratio)
    if k <= 0:
        thresh = jnp.inf
    elif k >= total:
        thresh = -jnp.inf
    else:
        # threshold = k-th largest value; sort once instead of ranking twice
        thresh = jnp.sort(flat)[total - k]
    masks = [
        (jnp.abs(l.astype(jnp.float32)) >= thresh).astype(jnp.float32)
        for l in leaves
    ]
    return jax.tree_util.tree_unflatten(treedef, masks)


def mask_sparsity(mask) -> float:
    """Fraction of zeroed (non-salient) weights — the reference's logged
    invariant (Classification/unlearn/sfron.py:335)."""
    return float(tr.sparsity(mask))


def pack_mask(mask) -> dict:
    """Bit-pack a 0/1 float mask pytree for storage (numpy, host-side)."""
    flat, treedef = jax.tree_util.tree_flatten(mask)
    shapes = [l.shape for l in flat]
    bits = np.concatenate([np.asarray(l, np.float32).ravel() > 0.5
                           for l in flat])
    return {
        "packed": np.packbits(bits),
        "shapes": shapes,
        "treedef": treedef,
        "total": bits.size,
    }


def unpack_mask(packed: dict):
    bits = np.unpackbits(packed["packed"])[: packed["total"]].astype(np.float32)
    leaves, offset = [], 0
    for shape in packed["shapes"]:
        n = int(np.prod(shape)) if shape else 1
        leaves.append(jnp.asarray(bits[offset : offset + n].reshape(shape)))
        offset += n
    return jax.tree_util.tree_unflatten(packed["treedef"], leaves)
