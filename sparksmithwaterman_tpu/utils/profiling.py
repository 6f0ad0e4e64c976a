"""Tracing and performance counters.

The reference's only instrumentation is wall-clock ms around each input
file (``src/sw/Distribution.java:147,200``; report line
``InOutOps.java:249``).  The TPU build's first-class metric is the DP
fill rate in GCUPS (giga cell updates per second, cells =
sum |ref| * |read|), plus on-demand ``jax.profiler`` traces (SURVEY.md
§5 tracing).
"""

from __future__ import annotations

import contextlib
import dataclasses
import time
from typing import Iterator, Optional


@dataclasses.dataclass
class GcupsCounter:
    """Accumulates DP cells and elapsed seconds across kernel calls."""

    cells: int = 0
    seconds: float = 0.0
    calls: int = 0

    def add(self, cells: int, seconds: float) -> None:
        self.cells += cells
        self.seconds += seconds
        self.calls += 1

    @contextlib.contextmanager
    def measure(self, cells: int) -> Iterator[None]:
        t0 = time.perf_counter()
        yield
        self.add(cells, time.perf_counter() - t0)

    @contextlib.contextmanager
    def measure_lazy(self):
        """Like ``measure`` but the cell count is supplied at the end
        (for pipelined loops that discover the workload as they go):
        ``with counter.measure_lazy() as done: ...; done(cells)``."""
        t0 = time.perf_counter()
        holder = {"cells": 0}
        yield lambda cells: holder.__setitem__("cells", cells)
        self.add(holder["cells"], time.perf_counter() - t0)

    @property
    def gcups(self) -> float:
        return self.cells / self.seconds / 1e9 if self.seconds else 0.0

    def report(self) -> str:
        return (
            f"{self.cells:,} cells in {self.seconds:.3f}s over "
            f"{self.calls} calls = {self.gcups:.2f} GCUPS"
        )


@contextlib.contextmanager
def profiler_trace(log_dir: Optional[str]) -> Iterator[None]:
    """``jax.profiler`` trace when a directory is given; no-op otherwise
    (so call sites can be unconditional)."""
    if not log_dir:
        yield
        return
    import jax

    with jax.profiler.trace(log_dir):
        yield
