"""Multi-host initialization.

The reference's one distributed script hand-rolls NCCL process groups
(DiT/sample_ddp.py:54-60). TPU-native: ``jax.distributed.initialize`` wires
every host into one global runtime; the mesh then spans all slices (ICI
within a slice, DCN across slices) and pjit emits the collectives.
"""
from __future__ import annotations

import logging

import jax

log = logging.getLogger("uurg.dist")


def initialize_distributed(coordinator: str | None = None,
                           num_processes: int | None = None,
                           process_id: int | None = None) -> None:
    """Idempotent multi-host init. On single-host runs this is a no-op; on
    TPU pods the arguments are auto-detected from the environment."""
    if jax.process_count() > 1:
        return  # already initialized
    try:
        if coordinator:
            jax.distributed.initialize(coordinator, num_processes, process_id)
        else:
            jax.distributed.initialize()
        log.info("distributed: %d processes, %d devices",
                 jax.process_count(), jax.device_count())
    except (ValueError, RuntimeError) as e:  # single-host / already init'd
        log.debug("distributed init skipped: %s", e)


def sync_global_devices(tag: str = "barrier") -> None:
    """Cross-host barrier (replaces dist.barrier() in sample_ddp.py:92-145);
    only needed around host-side filesystem rendezvous."""
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices(tag)
