"""Profiling / tracing helpers (SURVEY.md §5 tracing plan).

The reference has no timeline tracer (only hook-based FLOPs counters that
miss 3D convs). Here: ``jax.profiler`` traces viewable in XProf/TensorBoard,
plus simple wall-clock step timing.
"""

from __future__ import annotations

import contextlib
import time

import jax

__all__ = ["trace", "StepTimer", "device_memory_stats"]


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a device trace: ``with trace('/tmp/trace'): step()``."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Blocking per-step wall-clock timing with warmup discard
    (reference per-iteration timing, train.py:151-169 / predict.py:227-233)."""

    def __init__(self, warmup: int = 2):
        self.warmup = warmup
        self.times: list[float] = []
        self._seen = 0

    @contextlib.contextmanager
    def step(self, result_to_block=None):
        t0 = time.perf_counter()
        yield
        if result_to_block is not None:
            jax.block_until_ready(result_to_block)
        dt = time.perf_counter() - t0
        self._seen += 1
        if self._seen > self.warmup:
            self.times.append(dt)

    @property
    def mean(self) -> float:
        return sum(self.times) / max(len(self.times), 1)


def device_memory_stats(device=None) -> dict:
    """Live/peak HBM bytes for a device (serving memory budget checks)."""
    device = device or jax.devices()[0]
    stats = getattr(device, "memory_stats", lambda: None)()
    return dict(stats or {})
