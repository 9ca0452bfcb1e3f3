"""Autotune core: study runner + search-space spec.

Search-space spec (mirrors the reference's helpers,
``autotune/_core.py:283-342``):

  * tuple ``(lo, hi)``            -> integer range
  * tuple ``(lo, hi, 'log')``     -> log-scaled integer range
  * list ``[a, b, c]``            -> categorical
"""
from __future__ import annotations

import dataclasses
import math
import random
import time
from typing import Any, Callable

try:
    import optuna

    OPTUNA_AVAILABLE = True
except ImportError:  # pragma: no cover - environment-dependent
    optuna = None
    OPTUNA_AVAILABLE = False

SearchSpace = dict[str, Any]


@dataclasses.dataclass
class TuneResult:
    best_params: dict[str, Any]
    best_value: float          # items/sec
    trials: list[tuple[dict[str, Any], float]]
    sampler: str


def _validate_space(space: SearchSpace) -> None:
    for name, spec in space.items():
        if isinstance(spec, tuple):
            if len(spec) == 2 and all(isinstance(v, int) for v in spec):
                continue
            if (
                len(spec) == 3
                and all(isinstance(v, int) for v in spec[:2])
                and spec[2] == "log"
            ):
                continue
            raise ValueError(f"bad range spec for '{name}': {spec!r}")
        elif isinstance(spec, list):
            if not spec:
                raise ValueError(f"empty categorical for '{name}'")
        else:
            raise ValueError(f"spec for '{name}' must be tuple or list, got {spec!r}")


def _sample_random(space: SearchSpace, rng: random.Random) -> dict[str, Any]:
    params = {}
    for name, spec in space.items():
        if isinstance(spec, tuple):
            lo, hi = spec[0], spec[1]
            if len(spec) == 3:  # log range
                params[name] = int(
                    round(math.exp(rng.uniform(math.log(lo), math.log(hi))))
                )
            else:
                params[name] = rng.randint(lo, hi)
        else:
            params[name] = rng.choice(spec)
    return params


def _sample_optuna(space: SearchSpace, trial) -> dict[str, Any]:
    params = {}
    for name, spec in space.items():
        if isinstance(spec, tuple):
            log = len(spec) == 3
            params[name] = trial.suggest_int(name, spec[0], spec[1], log=log)
        else:
            params[name] = trial.suggest_categorical(name, spec)
    return params


def run_study(
    objective: Callable[[dict[str, Any]], float],
    search_space: SearchSpace,
    n_trials: int = 20,
    seed: int = 0,
    time_budget_s: float | None = None,
    verbose: bool = False,
) -> TuneResult:
    """Maximize ``objective(params) -> items/sec`` over the space.

    Failed trials (exceptions) score 0. Uses Optuna TPE when available,
    else seeded random search.
    """
    _validate_space(search_space)
    trials: list[tuple[dict[str, Any], float]] = []
    start = time.perf_counter()

    def timed_out() -> bool:
        return time_budget_s is not None and (
            time.perf_counter() - start > time_budget_s
        )

    def score(params: dict[str, Any]) -> float:
        try:
            return float(objective(params))
        except Exception as e:  # failed config counts as 0 items/sec
            if verbose:
                print(f"[autotune] trial {params} failed: {e}")
            return 0.0

    if OPTUNA_AVAILABLE:
        sampler_name = "optuna-tpe"
        study = optuna.create_study(
            direction="maximize",
            sampler=optuna.samplers.TPESampler(seed=seed),
        )

        def opt_objective(trial):
            if timed_out():
                raise optuna.TrialPruned()
            params = _sample_optuna(search_space, trial)
            v = score(params)
            trials.append((params, v))
            return v

        study.optimize(opt_objective, n_trials=n_trials, catch=())
    else:
        sampler_name = "random"
        rng = random.Random(seed)
        for _ in range(n_trials):
            if timed_out():
                break
            params = _sample_random(search_space, rng)
            v = score(params)
            trials.append((params, v))
            if verbose:
                print(f"[autotune] {params} -> {v:.1f} items/s")

    if not trials:
        raise RuntimeError("autotune produced no trials (time budget too small?)")
    best_params, best_value = max(trials, key=lambda t: t[1])
    return TuneResult(
        best_params=best_params,
        best_value=best_value,
        trials=trials,
        sampler=sampler_name,
    )
