"""Workload-specific tuning wrappers.

Mirrors the reference's ``tune_*.py`` modules: each wrapper defines the
TPU-meaningful search space for one workload and an items/sec objective,
then delegates to :func:`run_study`.
"""
from __future__ import annotations

import time

import numpy as np

import jax.numpy as jnp

from nvmolkit_tpu.autotune._core import SearchSpace, TuneResult, run_study
from nvmolkit_tpu.utils.config import HardwareOptions

_BUCKET_CHOICES = [
    (32, 64, 128, 256),
    (32, 128, 256),
    (64, 256),
    (16, 32, 64, 128, 256),
]


def tune_cross_similarity(
    fps: np.ndarray,
    n_trials: int = 8,
    seed: int = 0,
) -> TuneResult:
    """Tune the similarity MXU path: operand dtype and row-chunk size."""
    from nvmolkit_tpu.ops.similarity import cross_similarity_chunked

    space: SearchSpace = {
        "dtype": ["int8", "bfloat16"],
        "max_device_memory_mb": (64, 4096, "log"),
    }

    def objective(params) -> float:
        dtype = jnp.int8 if params["dtype"] == "int8" else jnp.bfloat16
        t0 = time.perf_counter()
        cross_similarity_chunked(
            fps,
            fps,
            dtype=dtype,
            max_device_memory_bytes=params["max_device_memory_mb"] << 20,
        )
        dt = time.perf_counter() - t0
        return (fps.shape[0] ** 2) / dt

    return run_study(objective, space, n_trials=n_trials, seed=seed)


def tune_uff_optimize(
    mols,
    n_trials: int = 6,
    max_iters: int = 100,
    seed: int = 0,
) -> TuneResult:
    """Tune atom bucketing for batched UFF minimization."""
    from nvmolkit_tpu.uffOptimization import UFFOptimizeMoleculesConfs

    space: SearchSpace = {"buckets": list(range(len(_BUCKET_CHOICES)))}
    n_systems = sum(len(m.conformers) for m in mols)

    def objective(params) -> float:
        opts = HardwareOptions(atomBuckets=_BUCKET_CHOICES[params["buckets"]])
        t0 = time.perf_counter()
        UFFOptimizeMoleculesConfs(
            mols, maxIters=max_iters, hardwareOptions=opts
        )
        return n_systems / (time.perf_counter() - t0)

    result = run_study(objective, space, n_trials=n_trials, seed=seed)
    result.best_params = {
        "atomBuckets": _BUCKET_CHOICES[result.best_params["buckets"]]
    }
    return result
