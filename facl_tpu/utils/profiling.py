"""Profiling / tracing hooks (the reference has none — SURVEY §5.1).

``trace`` wraps a region in a jax.profiler trace (view in TensorBoard /
Perfetto); ``StepTimer`` tracks wall-clock step times and derives the
driver metric, clips/sec/chip.
"""
from __future__ import annotations

import contextlib
import time
from typing import Iterator, List, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: Optional[str]) -> Iterator[None]:
    """Profile the enclosed region to ``log_dir`` (no-op when None)."""
    if not log_dir:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    def __init__(self, clips_per_step: int, warmup: int = 2):
        self.clips_per_step = clips_per_step
        self.warmup = warmup
        self.times: List[float] = []
        self._t0: Optional[float] = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.times.append(time.perf_counter() - self._t0)

    @property
    def steady_times(self) -> List[float]:
        return self.times[self.warmup:] if len(self.times) > self.warmup \
            else self.times

    @property
    def mean_step_seconds(self) -> float:
        ts = self.steady_times
        return sum(ts) / len(ts) if ts else 0.0

    def clips_per_sec(self, n_chips: int = 1) -> float:
        m = self.mean_step_seconds
        return self.clips_per_step / m / max(n_chips, 1) if m else 0.0
