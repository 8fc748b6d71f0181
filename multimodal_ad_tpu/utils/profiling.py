"""Profiling & step timing.

The reference's only performance observability is wall-clock epoch prints
(reference train_ResNet3D.py:202,286). Here (SURVEY.md §5 tracing entry):

- `StepTimer`: per-step wall times with p50/p95/mean summary,
- `trace(log_dir)`: context manager around `jax.profiler` emitting a
  TensorBoard-viewable device trace,
- `annotate(name)`: TraceAnnotation passthrough for labeling host spans.
"""

from __future__ import annotations

import contextlib
import time

import numpy as np


class StepTimer:
    def __init__(self):
        self.times: list[float] = []
        self._t0 = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.times.append(time.perf_counter() - self._t0)
        return False

    def summary(self) -> dict:
        if not self.times:
            return {}
        t = np.asarray(self.times)
        return {
            "steps": len(t),
            "mean_s": float(t.mean()),
            "p50_s": float(np.percentile(t, 50)),
            "p95_s": float(np.percentile(t, 95)),
            "total_s": float(t.sum()),
        }


@contextlib.contextmanager
def trace(log_dir: str | None):
    """Device trace via jax.profiler when `log_dir` is set; no-op otherwise."""
    if not log_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    import jax

    return jax.profiler.TraceAnnotation(name)
