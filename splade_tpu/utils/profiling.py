"""Profiling/tracing subsystem.

The reference has wall-clock timing only (SURVEY.md §5.1). Here tracing is
first-class: ``jax.profiler`` trace capture around any step function, a
step-timer context manager feeding the metrics tracker, and a simple
TraceReport summarizing device/host time.
"""

from __future__ import annotations

import contextlib
import json
import time
from pathlib import Path
from typing import Any, Callable, Dict, Iterator, List, Optional


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """Capture a jax.profiler trace (view with TensorBoard or xprof)."""
    import jax

    Path(log_dir).mkdir(parents=True, exist_ok=True)
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Per-step wall-clock stats with warmup exclusion and percentile report."""

    def __init__(self, warmup: int = 1):
        self.warmup = warmup
        self.times: List[float] = []
        self._n = 0
        self._t0: Optional[float] = None

    @contextlib.contextmanager
    def step(self) -> Iterator[None]:
        t0 = time.perf_counter()
        yield
        dt = time.perf_counter() - t0
        self._n += 1
        if self._n > self.warmup:
            self.times.append(dt)

    def summary(self) -> Dict[str, float]:
        import numpy as np

        if not self.times:
            return {"steps": 0}
        arr = np.asarray(self.times)
        return {
            "steps": len(arr),
            "mean_ms": float(arr.mean() * 1000),
            "p50_ms": float(np.percentile(arr, 50) * 1000),
            "p95_ms": float(np.percentile(arr, 95) * 1000),
            "max_ms": float(arr.max() * 1000),
        }


def profile_fn(fn: Callable, args: tuple, log_dir: str, steps: int = 3) -> Dict[str, Any]:
    """Warm up, capture a trace of `steps` invocations, return timing stats."""
    import jax

    out = fn(*args)
    jax.block_until_ready(jax.tree_util.tree_leaves(out)[0])
    timer = StepTimer(warmup=0)
    with trace(log_dir):
        for _ in range(steps):
            with timer.step():
                out = fn(*args)
                jax.block_until_ready(jax.tree_util.tree_leaves(out)[0])
    stats = timer.summary()
    (Path(log_dir) / "step_times.json").write_text(json.dumps(stats, indent=2))
    return stats
