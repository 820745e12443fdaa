"""Tracing / profiling helpers.

The reference had only wall-clock timing in examples (SURVEY §5). Here:
phase timers aggregated per name, and optional XLA trace capture via
jax.profiler (viewable in TensorBoard/Perfetto).
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict

import jax


class PhaseTimer:
    """Accumulates wall-clock per named phase.

    >>> timer = PhaseTimer()
    >>> with timer.phase("compile"):
    ...     ...
    >>> timer.summary()
    """

    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def summary(self) -> Dict[str, dict]:
        return {name: {"total_s": self.totals[name],
                       "count": self.counts[name],
                       "mean_s": self.totals[name] / self.counts[name]}
                for name in self.totals}

    def reset(self):
        self.totals.clear()
        self.counts.clear()


@contextlib.contextmanager
def xla_trace(log_dir: str):
    """Capture an XLA/device trace for TensorBoard (jax.profiler.trace)."""
    with jax.profiler.trace(log_dir):
        yield


@contextlib.contextmanager
def annotate(name: str):
    """Named region in the device trace (TraceAnnotation)."""
    with jax.profiler.TraceAnnotation(name):
        yield
