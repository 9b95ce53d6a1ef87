"""Profiling hooks (SURVEY.md 5: the reference has none; tqdm only).

`trace(dir)` wraps a code region in a jax.profiler trace (viewable in
TensorBoard / Perfetto), `step_timer` yields per-step wall times around the
jitted train step for img/s accounting.
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator, List


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Wall-clock per-step timing with warmup discard."""

    def __init__(self, warmup: int = 2):
        self.warmup = warmup
        self.times: List[float] = []
        self._count = 0
        self._t0 = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        dt = time.perf_counter() - self._t0
        self._count += 1
        if self._count > self.warmup:
            self.times.append(dt)
        return False

    @property
    def mean(self) -> float:
        return sum(self.times) / max(len(self.times), 1)
