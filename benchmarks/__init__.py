from benchmarks.harness import (
    ConsistencyMetrics,
    FlopsBenchmark,
    MemoryMetrics,
    SequenceMetrics,
    SpeedMetrics,
    chained_timeit,
)

__all__ = ["SpeedMetrics", "SequenceMetrics", "ConsistencyMetrics",
           "MemoryMetrics", "FlopsBenchmark", "chained_timeit"]
