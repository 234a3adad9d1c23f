"""Profiling & throughput metering (SURVEY.md §5 aux subsystems).

The reference's only observability is wall-clock prints; here:
  * `trace(dir)` — context manager around jax.profiler for device
    traces viewable in XProf/TensorBoard;
  * `Meter` — rolling patches/sec / Mpx/s meter (the BASELINE.json
    tracked metrics). Library utility for embedders; the CLI train loop
    and bench.py time their own intervals inline (review r2: this
    docstring previously claimed they use Meter — they do not).
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional


@contextlib.contextmanager
def trace(trace_dir: Optional[str]) -> Iterator[None]:
    """jax.profiler trace if a directory is given, else no-op."""
    if not trace_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(trace_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class Meter:
    """Rolling throughput meter: count units (patches, pixels) between
    reads. The FIRST add() only starts the clock — its units were
    produced before timing began, and counting them against zero elapsed
    inflated the early rate (review r2)."""

    def __init__(self) -> None:
        self.reset()

    def reset(self) -> None:
        self._units = 0
        self._t0: Optional[float] = None

    def add(self, units: int) -> None:
        if self._t0 is None:
            self._t0 = time.perf_counter()
            return
        self._units += units

    @property
    def rate(self) -> float:
        if self._t0 is None:
            return 0.0
        dt = time.perf_counter() - self._t0
        return self._units / dt if dt > 0 else 0.0
