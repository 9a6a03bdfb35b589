"""Performance monitoring — a real implementation of the reference's
declared-only ``PerfStats``/``PerformanceMonitor`` (``include/fhe.cuh:169-198``,
never defined there).

cudaEvent timing becomes wall-clock around ``block_until_ready`` (the JAX
dispatch is async exactly like CUDA streams, so timing must synchronize)."""

from __future__ import annotations

import contextlib
import dataclasses
import time
from collections import defaultdict

import jax


@dataclasses.dataclass
class PerfStats:
    """Aggregate op statistics (reference ``PerfStats``, include/fhe.cuh:169-181)."""

    times_ms: dict[str, float]
    counts: dict[str, int]

    def mean_ms(self, op: str) -> float:
        c = self.counts.get(op, 0)
        return self.times_ms.get(op, 0.0) / c if c else 0.0


class PerformanceMonitor:
    """start/stop timer map (reference ``PerformanceMonitor``,
    include/fhe.cuh:183-198)."""

    def __init__(self):
        self.reset()

    def reset(self):
        self._total_ms = defaultdict(float)
        self._counts = defaultdict(int)
        self._open = {}

    def start_timer(self, op: str):
        self._open[op] = time.perf_counter()

    def stop_timer(self, op: str):
        t0 = self._open.pop(op, None)
        if t0 is None:
            return
        self._total_ms[op] += (time.perf_counter() - t0) * 1e3
        self._counts[op] += 1

    def record_operation(self, op: str):
        self._counts[op] += 1

    @contextlib.contextmanager
    def time(self, op: str, sync=None):
        """Context manager; pass sync=array-like to block on async dispatch."""
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if sync is not None:
                jax.block_until_ready(sync)
            self._total_ms[op] += (time.perf_counter() - t0) * 1e3
            self._counts[op] += 1

    def get_stats(self) -> PerfStats:
        return PerfStats(times_ms=dict(self._total_ms), counts=dict(self._counts))

    def print_stats(self):
        stats = self.get_stats()
        for op in sorted(stats.counts):
            print(f"  {op:20s} {stats.counts[op]:6d} calls  "
                  f"{stats.mean_ms(op):10.3f} ms/call  "
                  f"{stats.times_ms[op]:10.1f} ms total")
