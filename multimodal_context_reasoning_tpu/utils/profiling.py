"""Profiling hooks.

The reference has no tracing/profiling beyond a progress bar
(SURVEY.md §5); here: a jax.profiler trace context for TensorBoard captures
and a blocking step timer for honest examples/sec numbers.
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: Optional[str]) -> Iterator[None]:
    """jax.profiler trace (viewable in TensorBoard / xprof); no-op if
    ``log_dir`` is None."""
    if log_dir is None:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Wall-clock timer that blocks on device results before reading time —
    async dispatch otherwise under-reports step cost."""

    def __init__(self):
        self.t0: Optional[float] = None
        self.elapsed: float = 0.0
        self.steps: int = 0

    def start(self) -> None:
        self.t0 = time.perf_counter()

    def stop(self, *block_on) -> float:
        for x in block_on:
            jax.block_until_ready(x)
        dt = time.perf_counter() - self.t0
        self.elapsed += dt
        self.steps += 1
        return dt

    def rate(self, items_per_step: int) -> float:
        return items_per_step * self.steps / self.elapsed if self.elapsed else 0.0
