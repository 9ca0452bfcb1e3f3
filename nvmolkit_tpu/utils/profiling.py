"""Tracing / profiling utilities.

TPU-native counterpart of the reference's NVTX ranges and stage timers
(``src/utils/nvtx.h:36-70``, ``ETKDGDriver`` stage stats,
``etkdg_impl.h:120-126``): named trace scopes show up in
``jax.profiler`` traces (XProf), and :class:`StageTimer` collects
host-side per-stage wall-time statistics with the same
min/max/total/count table the reference prints in debug mode.
"""
from __future__ import annotations

import contextlib
import dataclasses
import time
from collections import defaultdict

import jax


@contextlib.contextmanager
def trace_scope(name: str):
    """Named scope visible in jax.profiler traces AND usable as a plain
    host-side annotation."""
    with jax.profiler.TraceAnnotation(name):
        yield


@dataclasses.dataclass
class StageStat:
    count: int = 0
    total: float = 0.0
    min: float = float("inf")
    max: float = 0.0

    def add(self, dt: float) -> None:
        self.count += 1
        self.total += dt
        self.min = min(self.min, dt)
        self.max = max(self.max, dt)


class StageTimer:
    """Accumulates per-stage wall times; ``report()`` renders a table."""

    def __init__(self):
        self.stats: dict[str, StageStat] = defaultdict(StageStat)

    @contextlib.contextmanager
    def stage(self, name: str):
        with trace_scope(name):
            t0 = time.perf_counter()
            try:
                yield
            finally:
                self.stats[name].add(time.perf_counter() - t0)

    def report(self) -> str:
        lines = [f"{'stage':<28} {'count':>6} {'total_s':>9} {'min_ms':>8} {'max_ms':>8}"]
        for name, s in self.stats.items():
            lines.append(
                f"{name:<28} {s.count:>6} {s.total:>9.3f} "
                f"{s.min * 1e3:>8.2f} {s.max * 1e3:>8.2f}"
            )
        return "\n".join(lines)


def start_trace(log_dir: str) -> None:
    """Begin a jax.profiler trace (view with XProf/TensorBoard)."""
    jax.profiler.start_trace(log_dir)


def stop_trace() -> None:
    jax.profiler.stop_trace()
