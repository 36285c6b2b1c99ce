"""Profiling & throughput instrumentation (SURVEY.md §5.1).

The reference's only perf tooling is the wall-clock FPS loop in
``deeplab.py:211-264``.  Here: ``jax.profiler`` trace capture around any
code block plus steps/sec / images/sec-per-chip counters for training loops.
"""

from __future__ import annotations

import contextlib
import time
from typing import Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/jax-trace", enabled: bool = True):
    """Capture a profiler trace viewable in TensorBoard/XProf."""
    if not enabled:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class ThroughputMeter:
    """Images/sec (total and per-chip) + steps/sec over a sliding window."""

    def __init__(self, window: int = 50, num_chips: Optional[int] = None):
        self.window = window
        self.num_chips = num_chips or jax.device_count()
        self.reset()

    def reset(self):
        self._events = []  # (t, n_images)

    def step(self, n_images: int):
        now = time.perf_counter()
        self._events.append((now, n_images))
        if len(self._events) > self.window:
            self._events.pop(0)

    @property
    def images_per_sec(self) -> float:
        if len(self._events) < 2:
            return 0.0
        dt = self._events[-1][0] - self._events[0][0]
        n = sum(x for _, x in self._events[1:])
        return n / max(dt, 1e-9)

    @property
    def images_per_sec_per_chip(self) -> float:
        return self.images_per_sec / max(self.num_chips, 1)

    @property
    def steps_per_sec(self) -> float:
        if len(self._events) < 2:
            return 0.0
        dt = self._events[-1][0] - self._events[0][0]
        return (len(self._events) - 1) / max(dt, 1e-9)

    def summary(self) -> dict:
        return {
            "images_per_sec": round(self.images_per_sec, 2),
            "images_per_sec_per_chip": round(self.images_per_sec_per_chip, 2),
            "steps_per_sec": round(self.steps_per_sec, 3),
            "num_chips": self.num_chips,
        }
