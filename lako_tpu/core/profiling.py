"""Profiling / tracing hooks (SURVEY.md §5.1 — absent in the reference, which
only had wall-clock prints; here wired to jax.profiler)."""

from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional

import jax


@contextlib.contextmanager
def trace(profile_dir: Optional[str]) -> Iterator[None]:
    """Capture an XLA/TPU trace into ``profile_dir`` (viewable in TensorBoard /
    xprof). No-op when dir is None."""
    if profile_dir is None:
        yield
        return
    jax.profiler.start_trace(profile_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Rolling per-step wall-clock stats for train loops."""

    def __init__(self, warmup: int = 2):
        self.warmup = warmup
        self.count = 0
        self.total = 0.0
        self._t0 = None

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self):
        dt = time.perf_counter() - self._t0
        self.count += 1
        if self.count > self.warmup:
            self.total += dt
        return dt

    @property
    def mean(self) -> float:
        n = self.count - self.warmup
        return self.total / n if n > 0 else float("nan")

    def annotate(self, name: str):
        return jax.profiler.TraceAnnotation(name)
