"""Tracing / profiling utilities.

The reference has only dormant hooks (`--measure_time` never implemented,
SURVEY.md §5.1) plus ad-hoc timers (`utils/timer.py`). Here the gap is
filled properly with `jax.profiler` integration:

  * `trace(dir)` — context manager writing a TensorBoard-viewable XPlane
    trace of everything inside;
  * `annotate(name)` — named scope that shows up in the trace
    (`jax.profiler.TraceAnnotation`);
  * `Timer` / `timings` — host-side accumulating timers matching the
    reference's `simple_timer`/`timming` singleton (`utils/timer.py:5-22`).
"""
from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Iterator

import jax

__all__ = ["trace", "annotate", "Timer", "timings", "timed"]


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named scope visible in device traces."""
    return jax.profiler.TraceAnnotation(name)


class Timer:
    """Accumulating wall-clock timer."""

    def __init__(self):
        self.total = 0.0
        self.count = 0
        self._t0 = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.total += time.perf_counter() - self._t0
        self.count += 1

    @property
    def mean(self) -> float:
        return self.total / max(self.count, 1)


timings: Dict[str, Timer] = defaultdict(Timer)


@contextlib.contextmanager
def timed(name: str) -> Iterator[None]:
    """Accumulate into the global `timings` dict (the reference's `timming`
    singleton pattern)."""
    with timings[name]:
        yield
