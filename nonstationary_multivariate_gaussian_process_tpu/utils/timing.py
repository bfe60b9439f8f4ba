"""Tracing & profiling: per-stage timers and jax.profiler integration.

Replaces the reference's ad-hoc ``time.time()`` delta prints scattered through
the drivers (``Stationary_model.py:119,129``,
``Nonseparable_model_distributed.py:289-291``; SURVEY §5 tracing row) with a
structured stage-timer registry and an optional XLA profiler trace context.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict


class StageTimer:
    """Accumulating named stage timer.

    >>> timer = StageTimer()
    >>> with timer("map"):
    ...     ...
    >>> timer.report()   # {'map': {'total_s': ..., 'count': ...}}
    """

    def __init__(self):
        self._totals = defaultdict(float)
        self._counts = defaultdict(int)

    @contextlib.contextmanager
    def __call__(self, stage: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self._totals[stage] += time.perf_counter() - t0
            self._counts[stage] += 1

    def report(self) -> dict:
        return {
            k: {"total_s": self._totals[k], "count": self._counts[k],
                "mean_s": self._totals[k] / self._counts[k]}
            for k in self._totals
        }


@contextlib.contextmanager
def xla_trace(log_dir: str):
    """Capture a jax.profiler trace (TensorBoard-viewable) around a block."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def compile_stats():
    """Best-effort XLA compilation-cache statistics."""
    try:
        from jax._src import compilation_cache

        return {"cache_enabled": compilation_cache.is_persistent_cache_enabled()}
    except Exception:
        return {}
