"""Profiling and step-time metrics (SURVEY.md §5 tracing/profiling).

The reference's performance evidence is ad-hoc ``@time``/``@btime`` blocks
pasted into comments (``Fisher-KPP-CNN-Fourier.jl:305-395``,
``FENEP.jl:127-139``).  This module provides the disciplined equivalents:

* ``benchmark(fn, *args)`` — compile-then-time with device synchronization,
  returning compile time and run-time statistics (the ``@btime`` role),
* ``trace(logdir)`` — context manager around ``jax.profiler`` emitting a
  TensorBoard-loadable device trace (the production profiling story),
* ``StepTimer`` — rolling step-time/throughput metrics for training loops
  (the climate loop's walltime-per-step printouts).
"""
from __future__ import annotations

import contextlib
import time
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["benchmark", "null_dispatch_seconds", "trace", "StepTimer"]


def null_dispatch_seconds(repeats: int = 10):
    """Per-dispatch round-trip of a cached trivial program — the tunnel
    latency every dispatch pays regardless of compute (drifts 24-69 ms
    between sessions on the tunneled TPU, CLAUDE.md, so it must be
    MEASURED wherever a benchmark subtracts or reports it).  One shared
    definition for every artifact that records ``null_dispatch_ms``:
    mean and min of ``repeats`` synchronized round trips.

    Returns dict(mean_s, min_s).
    """
    null = jax.jit(lambda x: x + 1.0)
    x = jnp.zeros(())
    jax.block_until_ready(null(x))
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        jax.block_until_ready(null(x))
        times.append(time.perf_counter() - t0)
    times = np.asarray(times)
    return dict(mean_s=float(times.mean()), min_s=float(times.min()))


def benchmark(fn: Callable, *args, repeats: int = 20, warmup: int = 2, **kw):
    """Time a jittable callable with proper synchronization.

    Returns dict(compile_s, median_s, mean_s, std_s, min_s).
    """
    jfn = jax.jit(fn) if not hasattr(fn, "lower") else fn
    t0 = time.perf_counter()
    out = jfn(*args, **kw)
    jax.block_until_ready(out)
    compile_s = time.perf_counter() - t0
    for _ in range(warmup):
        jax.block_until_ready(jfn(*args, **kw))
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        jax.block_until_ready(jfn(*args, **kw))
        times.append(time.perf_counter() - t0)
    times = np.asarray(times)
    return dict(
        compile_s=compile_s,
        median_s=float(np.median(times)),
        mean_s=float(times.mean()),
        std_s=float(times.std()),
        min_s=float(times.min()),
    )


@contextlib.contextmanager
def trace(logdir: str = "/tmp/ude_tpu_trace"):
    """Capture a device trace viewable in TensorBoard/Perfetto."""
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Rolling training-step metrics: call ``tick()`` per step; read
    ``steps_per_sec`` / ``ms_per_step``."""

    def __init__(self, window: int = 50):
        self.window = window
        self._times = []
        self._last = None

    def tick(self):
        now = time.perf_counter()
        if self._last is not None:
            self._times.append(now - self._last)
            if len(self._times) > self.window:
                self._times.pop(0)
        self._last = now

    @property
    def ms_per_step(self):
        return 1e3 * float(np.mean(self._times)) if self._times else float("nan")

    @property
    def steps_per_sec(self):
        return 1.0 / float(np.mean(self._times)) if self._times else float("nan")
