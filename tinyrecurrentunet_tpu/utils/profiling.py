"""Profiling hooks: jax.profiler traces around the train/streaming steps.

The reference had only wall-clock timing (reference `rt.py:23-27`); here
the device timeline is captured with the XLA profiler so kernel-level cost
(MXU occupancy, fusion boundaries, HBM stalls) is inspectable in
TensorBoard or Perfetto (SURVEY.md §5 tracing gap).
"""

from __future__ import annotations

import contextlib
import os
import time

import jax


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/trunet_trace"):
    """Capture an XLA profiler trace for the enclosed block.

    View with: tensorboard --logdir <log_dir>  (or upload the .pb to
    ui.perfetto.dev).
    """
    os.makedirs(log_dir, exist_ok=True)
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name: str):
    """Named region inside a trace (shows up on the profiler timeline)."""
    with jax.profiler.TraceAnnotation(name):
        yield


class StepTimer:
    """Lightweight wall-clock step statistics (p50/p95/max) for loops."""

    def __init__(self):
        self.samples: list[float] = []

    @contextlib.contextmanager
    def measure(self):
        start = time.perf_counter()
        yield
        self.samples.append(time.perf_counter() - start)

    def stats(self) -> dict:
        if not self.samples:
            return {}
        s = sorted(self.samples)
        n = len(s)
        return {
            "steps": n,
            "p50_ms": s[n // 2] * 1000,
            "p95_ms": s[min(n - 1, int(n * 0.95))] * 1000,
            "max_ms": s[-1] * 1000,
            "mean_ms": sum(s) / n * 1000,
        }
