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


def tune_mmff_optimize(
    mols,
    n_trials: int = 6,
    max_iters: int = 100,
    seed: int = 0,
) -> TuneResult:
    """Tune atom bucketing + minimize backend for batched MMFF
    minimization (reference: ``nvmolkit/autotune/tune_mmff_optimize.py``)."""
    from nvmolkit_tpu.mmffOptimization import MMFFOptimizeMoleculesConfs

    space: SearchSpace = {
        "buckets": list(range(len(_BUCKET_CHOICES))),
        "backend": ["flat", "lbfgs", "bfgs"],
    }
    n_systems = sum(len(m.conformers) for m in mols)

    def objective(params) -> float:
        opts = HardwareOptions(atomBuckets=_BUCKET_CHOICES[params["buckets"]])
        t0 = time.perf_counter()
        MMFFOptimizeMoleculesConfs(
            mols, maxIters=max_iters, hardwareOptions=opts,
            backend=params["backend"],
        )
        return n_systems / (time.perf_counter() - t0)

    result = run_study(objective, space, n_trials=n_trials, seed=seed)
    result.best_params = {
        "atomBuckets": _BUCKET_CHOICES[result.best_params["buckets"]],
        "backend": result.best_params["backend"],
    }
    return result


def tune_embed_molecules(
    mols,
    n_trials: int = 6,
    confs_per_molecule: int = 2,
    max_iterations: int = 5,
    seed: int = 0,
) -> TuneResult:
    """Tune atom bucketing + DG minimize iteration split for ETKDG
    embedding (reference: ``nvmolkit/autotune/tune_embed_molecules.py``)."""
    from nvmolkit_tpu.embedMolecules import EmbedMolecules, EmbedParameters

    space: SearchSpace = {
        "buckets": list(range(len(_BUCKET_CHOICES))),
        "first_minimize_iters": [200, 300, 400],
    }

    def objective(params) -> float:
        opts = HardwareOptions(atomBuckets=_BUCKET_CHOICES[params["buckets"]])
        import copy as _copy

        ep = EmbedParameters(firstMinimizeIters=params["first_minimize_iters"])
        fresh = [_copy.deepcopy(m) for m in mols]
        for m in fresh:
            m.conformers.clear()
        t0 = time.perf_counter()
        res = EmbedMolecules(
            fresh, params=ep, confsPerMolecule=confs_per_molecule,
            maxIterations=max_iterations, hardwareOptions=opts,
        )
        dt = time.perf_counter() - t0
        import numpy as _np

        n_ok = int(_np.asarray(res.conf_mask).sum())
        return n_ok / dt if n_ok else 0.0

    result = run_study(objective, space, n_trials=n_trials, seed=seed)
    result.best_params = {
        "atomBuckets": _BUCKET_CHOICES[result.best_params["buckets"]],
        "firstMinimizeIters": result.best_params["first_minimize_iters"],
    }
    return result


def tune_batched_forcefield(
    mols,
    n_trials: int = 6,
    max_iters: int = 100,
    ff: str = "mmff",
    seed: int = 0,
) -> TuneResult:
    """Tune bucketing + minimize backend for the BatchedForcefield
    minimize path (reference: ``tune_batched_forcefield.py``)."""
    from nvmolkit_tpu.batchedForcefield import (
        MMFFBatchedForcefield,
        UFFBatchedForcefield,
    )

    cls = MMFFBatchedForcefield if ff == "mmff" else UFFBatchedForcefield
    space: SearchSpace = {"buckets": list(range(len(_BUCKET_CHOICES)))}
    n_systems = sum(len(m.conformers) for m in mols)

    def objective(params) -> float:
        opts = HardwareOptions(atomBuckets=_BUCKET_CHOICES[params["buckets"]])
        bff = cls(mols, hardwareOptions=opts)
        t0 = time.perf_counter()
        bff.minimize(maxIters=max_iters)
        return n_systems / (time.perf_counter() - t0)

    result = run_study(objective, space, n_trials=n_trials, seed=seed)
    result.best_params = {
        "atomBuckets": _BUCKET_CHOICES[result.best_params["buckets"]]
    }
    return result


def tune_substructure(
    targets,
    queries,
    n_trials: int = 6,
    seed: int = 0,
) -> TuneResult:
    """Tune the substructure engine: native-vs-python engine and worker
    thread count (reference: ``nvmolkit/autotune/tune_substructure.py``)."""
    from nvmolkit_tpu.substructure import (
        SubstructSearchConfig,
        getSubstructMatches,
    )

    space: SearchSpace = {
        "worker_threads": [1, 2, 4, 8, 0],  # 0 = all cores
        "use_native": [True, False],
    }
    n_pairs = len(targets) * len(queries)

    def objective(params) -> float:
        cfg = SubstructSearchConfig(
            workerThreads=params["worker_threads"],
            useNativeEngine=params["use_native"],
        )
        t0 = time.perf_counter()
        getSubstructMatches(targets, queries, cfg)
        return n_pairs / (time.perf_counter() - t0)

    result = run_study(objective, space, n_trials=n_trials, seed=seed)
    result.best_params = {
        "workerThreads": result.best_params["worker_threads"],
        "useNativeEngine": result.best_params["use_native"],
    }
    return result
