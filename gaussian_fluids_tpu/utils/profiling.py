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
import os
import threading
import time
from collections import defaultdict
from typing import Dict

import jax


@contextlib.contextmanager
def trace(log_dir: str, limit_s: float = 0):
    """jax.profiler trace context: with profiling.trace('/tmp/prof'): ...

    ``limit_s`` > 0 stops the capture after that much wall-clock even if
    the block keeps running: the profiler buffers every event in host
    memory until stop, so an unbounded capture around an hours-long run
    (the reference workloads) grows without limit and dumps a trace no
    viewer loads. The timer makes ``--profile`` safe on real runs — the
    first ``limit_s`` seconds cover compile + steady-state epochs."""
    lock = threading.Lock()
    open_ = [True]

    def stop():
        with lock:
            if open_[0]:
                open_[0] = False
                jax.profiler.stop_trace()

    jax.profiler.start_trace(log_dir)
    timer = None
    if limit_s and limit_s > 0:
        timer = threading.Timer(limit_s, stop)
        timer.daemon = True
        timer.start()
    try:
        yield
    finally:
        if timer is not None:
            timer.cancel()
        stop()


def maybe_trace(log_dir):
    """``trace`` when a directory is given, no-op when None — the CLI's
    ``--profile DIR`` wiring. The capture window defaults to 300 s of
    wall-clock (GF_PROFILE_SECONDS overrides; 0 = unbounded)."""
    if not log_dir:
        return contextlib.nullcontext()
    return trace(log_dir, float(os.environ.get("GF_PROFILE_SECONDS", "300")))


def hard_sync(tree):
    """Device-completion barrier that actually waits.

    ``jax.block_until_ready`` returns BEFORE remote execution completes on
    the tunneled TPU runtime (axon) — async dispatch loops appear to
    "finish" in microseconds while kernels are still running. Fetching a
    concrete VALUE cannot lie: pull one element of every array leaf to the
    host. Use this (not block_until_ready) to bound any timed region."""
    import numpy as np
    for leaf in jax.tree.leaves(tree):
        if hasattr(leaf, "shape"):
            for _ in range(getattr(leaf, "ndim", 0)):
                leaf = leaf[0]
            np.asarray(leaf)
    return tree


class StepTimer:
    """Named wall-clock phase timer with value-fetch sync semantics."""

    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name: str, sync=None):
        """``sync`` must be a ZERO-ARG CALLABLE returning the tree to wait
        on, evaluated at block exit — passing an array directly would
        capture it at entry and sync values that were already concrete,
        recording only async dispatch time:

            with timer.phase('project', sync=lambda: carry):
                carry = run_chunk(carry, ...)
        """
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if sync is not None:
                hard_sync(sync() if callable(sync) else sync)
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
