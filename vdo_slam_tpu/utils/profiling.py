"""Tracing / profiling utilities.

The reference instruments 5 pipeline stages with clock() spans (Map.h:83-84,
SURVEY.md §5.1).  The rebuild keeps those wall-clock spans (MapState.timings)
and adds device-accurate tooling: block_until_ready timers and the JAX
profiler (TensorBoard traces of the actual TPU execution).
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict

import jax


class StageTimer:
    """Accumulating wall-clock timer with device synchronization."""

    def __init__(self):
        self.totals: dict[str, float] = defaultdict(float)
        self.counts: dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def span(self, name: str, sync_on=None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if sync_on is not None:
                jax.block_until_ready(sync_on)
            dt = time.perf_counter() - t0
            self.totals[name] += dt
            self.counts[name] += 1

    def summary(self) -> dict:
        return {
            k: {"total_s": v, "count": self.counts[k],
                "mean_ms": 1e3 * v / max(self.counts[k], 1)}
            for k, v in sorted(self.totals.items())
        }


@contextlib.contextmanager
def device_trace(log_dir: str):
    """JAX profiler trace context (view with TensorBoard / xprof)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def timed_call(fn, *args, **kwargs):
    """Run fn, sync all outputs, return (outputs, seconds)."""
    t0 = time.perf_counter()
    out = fn(*args, **kwargs)
    jax.block_until_ready(out)
    return out, time.perf_counter() - t0
