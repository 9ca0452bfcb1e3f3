"""Trial calibration: shrink the workload until one trial fits a budget.

Mirrors the reference's adaptive calibration-slice shrinking
(``autotune/_calibration.py``, ``_core.py:127-163``): run the workload
on a slice, halve the slice while a trial exceeds the per-trial budget.
"""
from __future__ import annotations

import time
from typing import Callable, Sequence


def auto_subsample(
    run: Callable[[Sequence], float],
    items: Sequence,
    per_trial_budget_s: float = 5.0,
    min_items: int = 8,
) -> Sequence:
    """Find a slice of ``items`` whose run time fits the budget.

    ``run(slice)`` executes the workload and returns elapsed seconds (or
    executes and lets us time it when it returns None).
    """
    n = len(items)
    while n > min_items:
        subset = items[:n]
        t0 = time.perf_counter()
        ret = run(subset)
        elapsed = ret if isinstance(ret, (int, float)) else time.perf_counter() - t0
        if elapsed <= per_trial_budget_s:
            return subset
        # shrink proportionally to the overshoot, at least by half
        shrink = max(2.0, elapsed / per_trial_budget_s)
        n = max(min_items, int(n / shrink))
    return items[:min_items]
