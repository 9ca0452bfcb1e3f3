"""Statistics-grade timing for benchmark harnesses.

Counterpart of the reference's ``benchmarks/benchmark_timing.py`` /
``bench_utils/timing.py`` (``TimingResult`` with median/mean/std,
``time_it`` with warmups and GPU sync). TPU twist: under the axon
tunnel ``block_until_ready`` does not synchronize, so callers pass a
``sync`` callable that forces a scalar fetch of the result (the
repo-wide timing rule, see ROUND2_NOTES).
"""
from __future__ import annotations

import statistics
import time
from dataclasses import dataclass, field
from typing import Callable


@dataclass
class TimingResult:
    times_s: list[float] = field(default_factory=list)

    @property
    def median_s(self) -> float:
        return statistics.median(self.times_s)

    @property
    def mean_s(self) -> float:
        return statistics.mean(self.times_s)

    @property
    def std_s(self) -> float:
        return statistics.stdev(self.times_s) if len(self.times_s) > 1 else 0.0

    @property
    def best_s(self) -> float:
        return min(self.times_s)

    def stats(self) -> dict:
        """Extra-field dict for ``_common.emit`` rows."""
        return {
            "runs": len(self.times_s),
            "median_s": self.median_s,
            "mean_s": self.mean_s,
            "std_s": self.std_s,
            "best_s": self.best_s,
        }


def time_it(
    func: Callable[[], object],
    runs: int = 3,
    warmups: int = 1,
    sync: Callable[[object], None] | None = None,
) -> TimingResult:
    """Time ``func`` over ``runs`` iterations after ``warmups``.

    ``sync(result)`` must force completion of the work (on TPU: a
    scalar fetch like ``float(jnp.sum(x))``); without it the enqueue
    time is measured, not the compute.
    """
    for _ in range(warmups):
        out = func()
        if sync is not None:
            sync(out)
    res = TimingResult()
    for _ in range(runs):
        t0 = time.perf_counter()
        out = func()
        if sync is not None:
            sync(out)
        res.times_s.append(time.perf_counter() - t0)
    return res
