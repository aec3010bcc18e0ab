"""Profiling/observability: jax.profiler trace capture + throughput meters.

The reference's only visibility is tqdm postfix metrics
(training/utils.py:85-103); here every Trainer can capture an XLA/TPU
profile (tensorboard-loadable) for a step window and reports steps/sec and
tokens/sec continuously.
"""
from __future__ import annotations

import time
from typing import Optional

import jax


class TraceWindow:
    """Capture a jax.profiler trace for steps [start, stop) of a loop."""

    def __init__(self, logdir: Optional[str], start: int = 10, stop: int = 13):
        self.logdir = logdir
        self.start = start
        self.stop = stop
        self._active = False

    def step(self, i: int) -> None:
        if self.logdir is None:
            return
        if i == self.start and self.stop > self.start and not self._active:
            jax.profiler.start_trace(self.logdir)
            self._active = True
        elif i >= self.stop and self._active:
            jax.profiler.stop_trace()
            self._active = False

    def close(self) -> None:
        if self._active:
            jax.profiler.stop_trace()
            self._active = False


class Throughput:
    """Rolling steps/sec and items/sec meter over the last ``window``
    updates — the first (compile-heavy) steps age out instead of
    permanently dragging the reported steady-state rate down."""

    def __init__(self, window: int = 50):
        from collections import deque

        self._times = deque([time.perf_counter()], maxlen=window + 1)
        self._items = deque(maxlen=window)
        self.steps = 0
        self.items = 0

    def update(self, items: int = 0) -> None:
        self.steps += 1
        self.items += items
        self._times.append(time.perf_counter())
        self._items.append(items)

    @property
    def steps_per_sec(self) -> float:
        dt = self._times[-1] - self._times[0]
        return (len(self._times) - 1) / dt if dt > 0 else 0.0

    @property
    def items_per_sec(self) -> float:
        dt = self._times[-1] - self._times[0]
        return sum(self._items) / dt if dt > 0 else 0.0

