"""Profiling subsystem tests (trace capture + step timing)."""

import json

import jax
import jax.numpy as jnp
import pytest

from splade_tpu.utils.profiling import StepTimer, profile_fn, trace


def test_step_timer_warmup_and_stats():
    t = StepTimer(warmup=2)
    for _ in range(7):
        with t.step():
            pass
    s = t.summary()
    assert s["steps"] == 5
    assert s["p50_ms"] >= 0 and s["max_ms"] >= s["p50_ms"]
    assert StepTimer().summary() == {"steps": 0}


def test_profile_fn_writes_trace_and_stats(tmp_path):
    f = jax.jit(lambda x: (x @ x).sum())
    x = jnp.ones((64, 64))
    stats = profile_fn(f, (x,), str(tmp_path / "trace"), steps=2)
    assert stats["steps"] == 2
    assert (tmp_path / "trace" / "step_times.json").exists()
    saved = json.loads((tmp_path / "trace" / "step_times.json").read_text())
    assert saved["mean_ms"] > 0
    # jax profiler wrote something under the trace dir
    assert any((tmp_path / "trace").rglob("*"))
