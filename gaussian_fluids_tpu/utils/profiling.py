"""Profiling & tracing utilities.

The reference's only instrumentation is wall-clock deltas printed every
100 epochs (reference 2D/initialize.py:32-35 etc.). Here:
  * the same per-chunk timers live in the fit/clone/project loops, and
  * ``trace(dir)`` wraps ``jax.profiler`` for real TPU traces (viewable in
    TensorBoard / Perfetto), plus
  * ``StepTimer`` aggregates named phase timings for per-frame reports.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """jax.profiler trace context: with profiling.trace('/tmp/prof'): ..."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Named wall-clock phase timer with block-until-ready semantics."""

    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name: str, sync=None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if sync is not None:
                jax.block_until_ready(sync)
            dt = time.perf_counter() - t0
            self.totals[name] += dt
            self.counts[name] += 1

    def report(self) -> str:
        lines = []
        for k in sorted(self.totals):
            lines.append(f"{k}: {self.totals[k]:.3f}s "
                         f"({self.counts[k]} calls, "
                         f"{self.totals[k] / max(self.counts[k], 1):.4f}s "
                         f"avg)")
        return "\n".join(lines)
