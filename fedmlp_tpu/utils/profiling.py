"""Profiling hooks.

The reference's profiling is commented-out time.time() deltas
(utils/local_training.py:1022-1060 etc., SURVEY.md §5). Here:
  * ``phase_timer`` — a structured per-phase wall-clock accumulator;
  * ``trace_round`` — a jax.profiler trace context for one federated
    round, viewable in TensorBoard/XProf.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict


class PhaseTimer:
    """Accumulates wall-clock per named phase across rounds."""

    def __init__(self):
        self.totals = defaultdict(float)
        self.counts = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.totals[name] += dt
            self.counts[name] += 1

    def report(self) -> dict:
        return {
            name: {"total_s": self.totals[name], "calls": self.counts[name],
                   "mean_s": self.totals[name] / max(1, self.counts[name])}
            for name in sorted(self.totals)
        }


@contextlib.contextmanager
def trace_round(log_dir: str | None):
    """jax.profiler trace for the enclosed round (no-op when dir is None)."""
    if not log_dir:
        yield
        return
    import jax

    with jax.profiler.trace(log_dir):
        yield
