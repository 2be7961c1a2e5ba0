"""Profiling hooks: step timing / throughput + jax.profiler traces.

The reference ships no profiling (SURVEY.md §5); these counters back the
images/sec benchmark and the `--trace_dir` CLI flag.
"""
from __future__ import annotations

import contextlib
import time
from typing import Optional

import jax


class StepTimer:
    """Wall-clock step timer with warmup-excluded throughput."""

    def __init__(self, warmup: int = 2):
        self.warmup = warmup
        self.steps = 0
        self.items = 0
        self._t0: Optional[float] = None

    def tick(self, batch_items: int) -> None:
        self.steps += 1
        if self.steps == self.warmup:
            self._t0 = time.perf_counter()
            self.items = 0
        elif self.steps > self.warmup:
            self.items += batch_items

    @property
    def elapsed(self) -> float:
        return (time.perf_counter() - self._t0) if self._t0 else 0.0

    @property
    def items_per_sec(self) -> float:
        return self.items / self.elapsed if self._t0 and self.elapsed > 0 else 0.0

    @property
    def steps_per_sec(self) -> float:
        n = self.steps - self.warmup
        return n / self.elapsed if self._t0 and self.elapsed > 0 else 0.0


@contextlib.contextmanager
def trace_context(trace_dir: Optional[str]):
    """jax.profiler trace if a directory is given, else a no-op."""
    if trace_dir:
        with jax.profiler.trace(trace_dir):
            yield
    else:
        yield
