"""Profiling / step-timing utilities.

The reference has no tracing at all (a dead ``timeit`` helper,
training_corresp.py:21-23).  Here step timing is a first-class metric and
device tracing is one context manager away.

Caveat measured on the axon-relay dev setup (see .claude/skills/verify):
every jit call pays a ~26 ms host round trip and bulk device->host pulls
are slow — time *through a forced scalar transfer* and run loops inside
one jit when benchmarking device code.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Optional

import jax


class StepTimer:
    """Rolling step-rate tracker: ``with timer.step(): ...`` then read stats."""

    def __init__(self, window: int = 100):
        self.window = window
        self.times = []
        self.count = 0

    @contextlib.contextmanager
    def step(self):
        t0 = time.perf_counter()
        yield
        dt = time.perf_counter() - t0
        self.count += 1
        self.times.append(dt)
        if len(self.times) > self.window:
            self.times.pop(0)

    @property
    def mean_s(self) -> float:
        return sum(self.times) / max(len(self.times), 1)

    @property
    def steps_per_s(self) -> float:
        m = self.mean_s
        return 1.0 / m if m > 0 else 0.0

    def metrics(self, prefix: str = "") -> Dict[str, float]:
        return {
            f"{prefix}step_time_s": self.mean_s,
            f"{prefix}steps_per_s": self.steps_per_s,
        }


@contextlib.contextmanager
def device_trace(log_dir: Optional[str]):
    """jax.profiler trace (TensorBoard format) when ``log_dir`` is set;
    no-op otherwise, so call sites can be left in production code."""
    if not log_dir:
        yield
        return
    with jax.profiler.trace(log_dir):
        yield
