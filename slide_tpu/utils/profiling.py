"""Profiling — the reference has only wall-clock prints (SURVEY.md §5.1);
here step timing is a first-class metric and full device traces come from
`jax.profiler` (viewable in TensorBoard/Perfetto)."""

from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def trace_profile(log_dir: str):
    """Capture a jax.profiler device trace for the enclosed block."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Wall-clock step timing with warmup skip and percentile summary."""

    def __init__(self, skip_first: int = 1):
        self.skip_first = skip_first
        self.times: list[float] = []
        self._seen = 0
        self._t = None

    def __enter__(self):
        self._t = time.perf_counter()
        return self

    def __exit__(self, *exc):
        dt = time.perf_counter() - self._t
        self._seen += 1
        if self._seen > self.skip_first:
            self.times.append(dt)
        return False

    def summary(self) -> dict:
        import numpy as np

        if not self.times:
            return {}
        arr = np.asarray(self.times)
        return {"mean_s": float(arr.mean()), "p50_s": float(np.median(arr)),
                "p95_s": float(np.percentile(arr, 95)), "n": len(arr),
                "steps_per_sec": float(1.0 / arr.mean())}
