"""Wall-clock timer (render.h:18-34 analog)."""

from __future__ import annotations

import time


class Timer:
    def __init__(self):
        self._start = time.perf_counter()

    def start(self) -> None:
        self._start = time.perf_counter()

    reset = start

    def seconds(self) -> float:
        return time.perf_counter() - self._start
