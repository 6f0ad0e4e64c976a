"""Streaming (running) median over an integer stream.

Same capability as the reference's two-heap implementation
(``src/metrics/RunningMedian.java:1-221``: a max-heap below, a min-heap
above, rebalanced to keep sizes within one); built on :mod:`heapq`
(Python has no max-heap, so the low half stores negated values).
Optionally journals each running median to a file, as the reference's
file-writer constructor does (``RunningMedian.java:54-76``).
"""

from __future__ import annotations

import heapq
from typing import IO, List, Optional


class RunningMedian:
    def __init__(self, out_path: Optional[str] = None):
        self._low: List[int] = []  # max-heap (negated)
        self._high: List[int] = []  # min-heap
        self._median: float = 0.0
        self._out: Optional[IO[str]] = open(out_path, "w") if out_path else None

    def add(self, value: int) -> float:
        """Insert a value; returns the new running median
        (``RunningMedian.java:106-122``)."""
        if not self._low or value <= -self._low[0]:
            heapq.heappush(self._low, -value)
        else:
            heapq.heappush(self._high, value)
        self._balance()
        self._median = self._calculate()
        if self._out is not None:
            self._out.write(f"{self._median}\n")
        return self._median

    def _balance(self) -> None:
        # Keep |len(low) - len(high)| <= 1 (RunningMedian.java:128-142).
        if len(self._low) > len(self._high) + 1:
            heapq.heappush(self._high, -heapq.heappop(self._low))
        elif len(self._high) > len(self._low) + 1:
            heapq.heappush(self._low, -heapq.heappop(self._high))

    def _calculate(self) -> float:
        # Odd count: middle element; even: mean of the two middles
        # (RunningMedian.java:148-176).
        if len(self._low) > len(self._high):
            return float(-self._low[0])
        if len(self._high) > len(self._low):
            return float(self._high[0])
        if not self._low:
            return 0.0
        return (-self._low[0] + self._high[0]) / 2.0

    @property
    def median(self) -> float:
        return self._median

    def close(self) -> None:
        if self._out is not None:
            self._out.close()
            self._out = None
