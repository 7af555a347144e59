"""Timers (reference: libs/util/timer.h).

WallTimer measures wall-clock milliseconds, ClockTimer CPU time —
the same split the reference uses for its per-stage progress reports.
"""

from __future__ import annotations

import time


class WallTimer:
    def __init__(self):
        self.reset()

    def reset(self) -> None:
        self._start = time.perf_counter()

    def get_elapsed(self) -> int:
        """Elapsed wall time in milliseconds."""
        return int((time.perf_counter() - self._start) * 1000.0)

    def get_elapsed_sec(self) -> float:
        return time.perf_counter() - self._start


class ClockTimer:
    def __init__(self):
        self.reset()

    def reset(self) -> None:
        self._start = time.process_time()

    def get_elapsed(self) -> int:
        """Elapsed CPU time in milliseconds."""
        return int((time.process_time() - self._start) * 1000.0)

    def get_elapsed_sec(self) -> float:
        return time.process_time() - self._start
