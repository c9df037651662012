"""Tracing / profiling helpers (SURVEY.md §5: new framework aux subsystem).

``jax.profiler`` traces + simple steps/s counters for the benchmark harness
and the training driver.
"""

from __future__ import annotations

import contextlib
import time
from typing import Optional

import jax


class Throughput:
    """Steps/s counter with jax.block_until_ready semantics."""

    def __init__(self):
        self.t0 = None
        self.steps = 0

    def start(self):
        self.t0 = time.perf_counter()
        self.steps = 0
        return self

    def add(self, n: int):
        self.steps += n

    def rate(self, sync=None) -> float:
        if sync is not None:
            jax.block_until_ready(sync)
        dt = time.perf_counter() - self.t0
        return self.steps / dt if dt > 0 else float("inf")


@contextlib.contextmanager
def trace(log_dir: Optional[str]):
    """Capture a jax.profiler trace (TensorBoard format) when log_dir set."""
    if not log_dir:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name: str):
    """Named region in the profiler timeline."""
    with jax.profiler.TraceAnnotation(name):
        yield
