"""Profiling: jax.profiler integration + lightweight timers.

The reference scatters ad-hoc timing through every layer (SURVEY.md §5);
here the stats dicts carry the same fields and this module adds the
TPU-native tracer: wrap any region in :func:`profile_trace` and open the
dump in TensorBoard/XProf to see per-op device time, HBM traffic, and MXU
utilization.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Iterator

__all__ = ["profile_trace", "Timer"]


@contextlib.contextmanager
def profile_trace(logdir: str) -> Iterator[None]:
    """Capture a jax.profiler trace of the enclosed region into ``logdir``
    (open in TensorBoard/XProf for per-op device time, HBM traffic, MXU
    utilization)."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class Timer:
    """Accumulating named wall-clock timer for stats dicts."""

    def __init__(self) -> None:
        self.totals: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}

    @contextlib.contextmanager
    def section(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def stats(self) -> Dict[str, dict]:
        return {
            name: {
                "total_seconds": self.totals[name],
                "count": self.counts[name],
                "avg_ms": 1000.0 * self.totals[name] / max(self.counts[name], 1),
            }
            for name in self.totals
        }
