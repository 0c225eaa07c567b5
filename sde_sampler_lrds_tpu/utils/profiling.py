"""Profiling / tracing hooks.

The reference ships only wall-clock timers (SURVEY.md §5). Here the timers
are kept (train/time_per_step etc. in solvers/base.py) and augmented with
jax.profiler integration: capture a TensorBoard-compatible device trace
around any block, and estimate the compiled per-step cost from the lowered
HLO (flops / bytes from XLA's cost analysis).
"""
from __future__ import annotations

import contextlib
import time
from pathlib import Path

import jax


@contextlib.contextmanager
def trace(log_dir: str | Path, enabled: bool = True):
    """Device-level profiler trace: view with TensorBoard or Perfetto."""
    if not enabled:
        yield
        return
    log_dir = str(log_dir)
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name: str):
    """Named region in the device trace (shows up per-op in the viewer)."""
    with jax.profiler.TraceAnnotation(name):
        yield


def compiled_cost(fn, *args, **kwargs) -> dict:
    """XLA cost analysis of the jitted fn at these shapes: flops, bytes
    accessed — the per-scan-step cost source SURVEY.md §5 calls for."""
    lowered = jax.jit(fn).lower(*args, **kwargs)
    compiled = lowered.compile()
    try:
        analysis = compiled.cost_analysis()
        if isinstance(analysis, list):
            analysis = analysis[0]
    except Exception:
        analysis = {}
    return {
        "flops": float(analysis.get("flops", float("nan"))),
        "bytes_accessed": float(analysis.get("bytes accessed", float("nan"))),
        "memory_mb": float(compiled.memory_analysis().temp_size_in_bytes / 2**20)
        if hasattr(compiled, "memory_analysis") else float("nan"),
    }


class StepTimer:
    """Rolling wall-clock timer matching the reference's train/time_per_step
    bookkeeping (solver/base.py:443)."""

    def __init__(self):
        self.start = time.time()
        self.count = 0

    def tick(self) -> float:
        self.count += 1
        return (time.time() - self.start) / self.count
