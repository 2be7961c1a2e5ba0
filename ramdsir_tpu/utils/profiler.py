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
        self._last: Optional[float] = None
        self._dirty = False  # ticks since the last mark (pending async work)

    def tick(self, batch_items: int) -> None:
        self.steps += 1
        now = time.perf_counter()
        if self.steps == self.warmup:
            self._t0 = now
            self.items = 0
        elif self.steps > self.warmup:
            self.items += batch_items
        self._last = now
        self._dirty = True

    def mark(self) -> None:
        """Extend the timing window to NOW without adding items.

        Call after a device sync (block_until_ready): ticks fire at dispatch
        time (async), so the window would otherwise end before the last
        steps actually executed.  One mark at a sync point makes
        items_per_sec a completed-work rate at the cost of a single sync.

        A mark with NO ticks since the previous mark is a no-op: the steps
        were already timed to completion, and anything that ran in between
        (eval, checkpoint saves, log flushes) is not step work — folding it
        in once turned a 296 img/s run into a reported 29.9."""
        if self._t0 and self._dirty:
            self._last = time.perf_counter()
        self._dirty = False

    @property
    def elapsed(self) -> float:
        # frozen at the LAST tick: throughput measures the training steps
        # themselves, not whatever runs after them (end-of-epoch eval can
        # cost a predict compile — reading the clock at summary time used
        # to fold that into images/sec).  Ticks fire right after the async
        # dispatch, so the window under-counts by at most one step.
        if not self._t0:
            return 0.0
        return (self._last or self._t0) - self._t0

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
