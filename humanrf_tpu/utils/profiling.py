"""Profiling & throughput instrumentation.

The reference has no profiling subsystem (SURVEY.md §5: a single wall-clock
print + tqdm rates); since rays/sec is the north-star metric here, tracing is
first-class: `jax.profiler` trace capture around training steps and a simple
exponential rate meter used by the trainer and bench.
"""
from __future__ import annotations

import contextlib
import time
from pathlib import Path

import jax


@contextlib.contextmanager
def trace(log_dir: Path, enabled: bool = True):
    """Capture a jax.profiler trace (view with TensorBoard's profile plugin)."""
    if not enabled:
        yield
        return
    log_dir = Path(log_dir)
    log_dir.mkdir(parents=True, exist_ok=True)
    jax.profiler.start_trace(str(log_dir))
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class RateMeter:
    """Windowed throughput meter: call .tick(n_items) per step."""

    def __init__(self):
        self.reset()

    def reset(self):
        self._t0 = time.time()
        self._items = 0

    def tick(self, n_items: int) -> None:
        self._items += n_items

    @property
    def rate(self) -> float:
        dt = time.time() - self._t0
        return self._items / dt if dt > 0 else 0.0

    def window(self) -> float:
        """Rate since last reset, then reset."""
        r = self.rate
        self.reset()
        return r
