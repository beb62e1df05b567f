"""Profiling / tracing harness (SURVEY.md §5: the reference only has
SystemTime println benchmarks; here: jax.profiler traces + a wall-clock
benchmark utility emitting the BASELINE metric shape)."""

from __future__ import annotations

import contextlib
import json
import time

import jax


@contextlib.contextmanager
def trace(dirname: str = "/tmp/halo2_tpu_trace"):
    """Capture a jax.profiler trace around a block (view with TensorBoard
    or Perfetto)."""
    jax.profiler.start_trace(dirname)
    try:
        yield dirname
    finally:
        jax.profiler.stop_trace()


def benchmark(fn, *args, reps: int = 3, warmup: int = 1, sync=None):
    """Best-of wall-clock timing with compile warmup.

    sync: callable run on the result to force completion (defaults to
    jax.block_until_ready; pass jax.device_get-based sync on backends whose
    block_until_ready does not synchronize — see bench.py)."""
    sync = sync or jax.block_until_ready
    for _ in range(warmup):
        sync(fn(*args))
    times = []
    for _ in range(reps):
        t0 = time.time()
        sync(fn(*args))
        times.append(time.time() - t0)
    return min(times), times


def metric_line(metric: str, value: float, unit: str, baseline: float) -> str:
    """The driver's one-line JSON metric format."""
    return json.dumps(
        {
            "metric": metric,
            "value": round(value, 1),
            "unit": unit,
            "vs_baseline": round(value / baseline, 4),
        }
    )
