"""Tracing / profiling utilities (SURVEY.md §5.1 — absent in the reference;
first-class here).

- FrameTimer: wall-clock frame statistics with device synchronization.
- trace(): context manager around jax.profiler for TensorBoard-compatible
  device traces of the render pipeline.
- annotate(): named trace spans visible in the profile.
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field
from typing import List

import jax


@dataclass
class FrameTimer:
    """Rolling frame statistics. ``tick`` around each frame render."""

    samples: List[float] = field(default_factory=list)
    max_samples: int = 240

    @contextlib.contextmanager
    def tick(self, result_to_block_on=None):
        t0 = time.perf_counter()
        out = {}
        yield out
        if result_to_block_on is not None:
            jax.block_until_ready(result_to_block_on)
        dt = time.perf_counter() - t0
        self.samples.append(dt)
        if len(self.samples) > self.max_samples:
            self.samples.pop(0)
        out["seconds"] = dt

    def record(self, seconds: float):
        self.samples.append(seconds)
        if len(self.samples) > self.max_samples:
            self.samples.pop(0)

    @property
    def fps(self) -> float:
        if not self.samples:
            return 0.0
        return len(self.samples) / sum(self.samples)

    def summary(self) -> dict:
        if not self.samples:
            return {"frames": 0}
        s = sorted(self.samples)
        n = len(s)
        return {
            "frames": n,
            "fps": self.fps,
            "ms_mean": 1e3 * sum(s) / n,
            "ms_p50": 1e3 * s[n // 2],
            "ms_p99": 1e3 * s[min(n - 1, int(n * 0.99))],
        }


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a device trace (view with TensorBoard's profile plugin)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named span inside a trace: ``with annotate('raster'): ...``."""
    return jax.profiler.TraceAnnotation(name)
