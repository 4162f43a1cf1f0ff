"""Orbax checkpointing.

Replaces the reference's torch.save formats (SURVEY.md section 5): DDPM's
list-format ``ckpt.pth`` (runners/diffusion.py:1187-1199), DiT's dict format
(forget.py:347-356), Classification's bare state-dict. One format here:
an Orbax composite of {params, ema_params, opt_state, step, model_state}
plus a JSON metadata sidecar. Torch interop lives in
``uurg_tpu.io.torch_interop``.
"""
from __future__ import annotations

import json
import os
from typing import Any

import jax
import numpy as np
import orbax.checkpoint as ocp


# in-flight async saves: (path, metadata) pairs awaiting finalization —
# drained by wait_for_saves() or the next blocking save_checkpoint
_PENDING: list = []

# ONE module-level checkpointer (an AsyncCheckpointer with its own background
# thread pool) reused for every save/restore: per-call construction leaked a
# thread pool per snapshot on long runs, and two checkpointers writing the
# same directory (async save + blocking re-save) could race Orbax's
# tmp-dir finalization
_CKPTR: ocp.StandardCheckpointer | None = None


def _checkpointer() -> ocp.StandardCheckpointer:
    global _CKPTR
    if _CKPTR is None:
        _CKPTR = ocp.StandardCheckpointer()
    return _CKPTR


def save_checkpoint(path: str, tree: Any, metadata: dict | None = None,
                    block: bool = True) -> None:
    """Save a pytree checkpoint at ``path`` (directory).

    ``block=False`` returns as soon as the host snapshot is taken and lets
    Orbax write in a background thread — the training loop keeps stepping
    while the 3.4GB SD-UNet state streams to disk. The device->host
    ``device_get`` still happens eagerly (the snapshot must not see later
    updates); call :func:`wait_for_saves` (or the next blocking save, which
    drains every pending async save first) to flush. Metadata sidecars are
    written at finalization time, never into Orbax's in-progress tmp dir."""
    path = os.path.abspath(path)
    if block:
        # never two writers on one directory: an in-flight async save of
        # this (or any) path must land before a blocking overwrite starts
        wait_for_saves()
    ckptr = _checkpointer()
    # np.asarray is a no-copy view over host-numpy leaves; the async path
    # needs a real snapshot (np.array copies) so later in-place mutation by
    # the caller can't leak into the in-flight write
    leaf_copy = np.asarray if block else (lambda x: np.array(x))
    host_tree = jax.tree_util.tree_map(leaf_copy, jax.device_get(tree))
    ckptr.save(path, host_tree, force=True)
    if not block:
        _PENDING.append((path, metadata))
        return
    ckptr.wait_until_finished()
    if metadata is not None:
        with open(os.path.join(path, "uurg_metadata.json"), "w") as f:
            json.dump(metadata, f, indent=2, default=str)


def wait_for_saves() -> None:
    """Block until every ``save_checkpoint(..., block=False)`` has landed
    on disk (and write their metadata sidecars)."""
    if _PENDING:
        _checkpointer().wait_until_finished()
    while _PENDING:
        path, metadata = _PENDING.pop()
        if metadata is not None:
            with open(os.path.join(path, "uurg_metadata.json"), "w") as f:
                json.dump(metadata, f, indent=2, default=str)


def is_checkpoint_dir(path: str) -> bool:
    return (os.path.exists(os.path.join(path, "_CHECKPOINT_METADATA"))
            or os.path.exists(os.path.join(path, "manifest.ocdbt")))


def resolve_checkpoint_dir(path: str) -> str:
    """Resolve a user-supplied path to the actual Orbax checkpoint dir.

    Accepts the checkpoint dir itself, a run dir containing ``ckpts/ckpt``
    or ``ckpt``, or a parent dir holding exactly one checkpoint subdir (the
    ``--save_path`` of the train CLIs). Returns ``path`` unchanged when
    nothing matches, so the downstream Orbax error names the original
    argument."""
    if is_checkpoint_dir(path):
        return path
    for sub in ("ckpts/ckpt", "ckpt"):
        cand = os.path.join(path, sub)
        if is_checkpoint_dir(cand):
            return cand
    if os.path.isdir(path):
        subs = [os.path.join(path, d) for d in sorted(os.listdir(path))]
        ckpts = [s for s in subs if os.path.isdir(s) and is_checkpoint_dir(s)]
        # auxiliary artifacts (fisher diagonals, saliency masks) are Orbax
        # checkpoints too — a run dir holding train state NEXT TO a
        # fisher_dict must never resolve to the fisher
        aux = ("fisher", "mask")
        ckpts = [s for s in ckpts
                 if not any(k in os.path.basename(s).lower() for k in aux)]
        if len(ckpts) == 1:
            return ckpts[0]
    return path


def restore_checkpoint(path: str, target: Any | None = None) -> Any:
    """Restore; ``target`` (a pytree of like-shaped arrays) guides structure.

    ``path`` may be the checkpoint dir or any of the containing layouts
    ``resolve_checkpoint_dir`` understands."""
    path = resolve_checkpoint_dir(os.path.abspath(path))
    ckptr = _checkpointer()
    if target is not None:
        host_target = jax.tree_util.tree_map(np.asarray,
                                             jax.device_get(target))
        return ckptr.restore(path, host_target)
    return ckptr.restore(path)


def load_metadata(path: str) -> dict | None:
    meta = os.path.join(os.path.abspath(path), "uurg_metadata.json")
    if os.path.exists(meta):
        with open(meta) as f:
            return json.load(f)
    return None
