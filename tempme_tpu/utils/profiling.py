"""Profiling hooks: jax.profiler traces + lightweight throughput counters.

The reference has only vestigial wall-clock timing (TGAT/TGAT.py:469-472,
dead); here tracing is a first-class tool (SURVEY.md §5.1).
"""
from __future__ import annotations

import contextlib
import time
from typing import Dict, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/tempme_trace"):
    """Capture a jax.profiler trace (view with tensorboard/xprof)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


class Throughput:
    """events/s (and arbitrary unit/s) counter with EMA smoothing."""

    def __init__(self, alpha: float = 0.2):
        self.alpha = alpha
        self.rate: Dict[str, float] = {}
        self._t0: Dict[str, float] = {}

    def start(self, name: str = "step"):
        self._t0[name] = time.time()

    def stop(self, name: str = "step", units: float = 1.0) -> float:
        dt = time.time() - self._t0[name]
        r = units / dt if dt > 0 else 0.0
        prev = self.rate.get(name)
        self.rate[name] = r if prev is None else \
            (1 - self.alpha) * prev + self.alpha * r
        return r


@contextlib.contextmanager
def annotate(name: str):
    """Named region visible in profiler traces."""
    with jax.profiler.TraceAnnotation(name):
        yield
