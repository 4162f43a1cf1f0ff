"""Profiling / timing utilities.

The reference logs only wall-clock steps/sec deltas
(DDPM/runners/diffusion.py:1182-1185, DiT/forget.py:329-336). TPU-native
equivalents: ``StepTimer`` (block_until_ready-accurate steps/sec) and
``trace`` (jax.profiler traces viewable in TensorBoard/Perfetto).
"""
from __future__ import annotations

import contextlib
import time

import jax


class StepTimer:
    """Accurate steps/sec: syncs the device at window boundaries only."""

    def __init__(self):
        self._start = None
        self._steps = 0

    def start(self, sync_on=None):
        if sync_on is not None:
            jax.block_until_ready(sync_on)
        self._start = time.perf_counter()
        self._steps = 0

    def tick(self, n: int = 1):
        self._steps += n

    def rate(self, sync_on=None) -> float:
        if sync_on is not None:
            jax.block_until_ready(sync_on)
        dt = time.perf_counter() - self._start
        return self._steps / dt if dt > 0 else float("inf")


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/uurg_trace"):
    """jax.profiler trace context: ``with trace('/tmp/t'): run_steps()``."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def maybe_trace(log_dir: str | None):
    """``trace`` when ``log_dir`` is non-empty, else a no-op — the
    ``--profile_dir`` CLI hook (view the trace in TensorBoard/Perfetto)."""
    if log_dir:
        with trace(log_dir):
            yield log_dir
    else:
        yield None


def timed(fn, *args, sync=True, **kwargs):
    """(result, seconds) with device sync."""
    t0 = time.perf_counter()
    out = fn(*args, **kwargs)
    if sync:
        jax.block_until_ready(out)
    return out, time.perf_counter() - t0
