"""Profiling utilities (SURVEY §5: the TPU-native observability equivalent
of the reference's wall-clock steps/sec logs)."""
import os

import jax
import jax.numpy as jnp

from uurg_tpu.utils.profiling import StepTimer, maybe_trace, timed


def test_step_timer_rate():
    t = StepTimer()
    x = jnp.ones((8,))
    t.start(sync_on=x)
    t.tick(5)
    assert t.rate(sync_on=x) > 0


def test_maybe_trace_off_is_noop():
    with maybe_trace("") as d:
        assert d is None
    with maybe_trace(None) as d:
        assert d is None


def test_maybe_trace_captures(tmp_path):
    """The --profile_dir CLI hook: a jax.profiler trace lands on disk."""
    log_dir = str(tmp_path / "trace")
    with maybe_trace(log_dir) as d:
        assert d == log_dir
        jax.block_until_ready(jax.jit(lambda x: x * 2)(jnp.ones((16,))))
    found = [os.path.join(r, f) for r, _, fs in os.walk(log_dir) for f in fs]
    assert found, "profiler trace wrote no files"


def test_timed_returns_result_and_seconds():
    out, secs = timed(jax.jit(lambda x: x + 1), jnp.zeros((4,)))
    assert float(out[0]) == 1.0
    assert secs >= 0
