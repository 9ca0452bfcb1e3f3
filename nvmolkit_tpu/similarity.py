"""Cross similarity — public API.

Mirrors the reference's ``nvmolkit/similarity.py:34-184``:
``crossTanimotoSimilarity`` / ``crossCosineSimilarity`` return the dense
[n, m] similarity matrix as an :class:`~nvmolkit_tpu.types.AsyncResult`;
the ``...MemoryConstrained`` variants chunk compute to bound device
memory and return host numpy.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from nvmolkit_tpu.ops.similarity import cross_similarity, cross_similarity_chunked
from nvmolkit_tpu.types import AsyncResult, check_stream_arg


def _as_packed(fp) -> jnp.ndarray:
    if isinstance(fp, AsyncResult):
        fp = fp.jax()
    arr = jnp.asarray(fp)
    if arr.ndim != 2:
        raise ValueError(f"expected packed fingerprints of shape (n, words), got {arr.shape}")
    if arr.dtype not in (jnp.uint32, jnp.int32):
        raise ValueError(f"expected uint32/int32 packed fingerprints, got {arr.dtype}")
    return arr.view(jnp.uint32) if arr.dtype == jnp.int32 else arr


def _cross(a, b, metric, hardwareOptions):
    if hardwareOptions is not None and hardwareOptions.deviceIds:
        from nvmolkit_tpu.parallel.distributed import (
            distributed_cross_similarity,
            resolve_devices,
        )

        devices = resolve_devices(hardwareOptions.deviceIds)
        if len(devices) > 1:
            return AsyncResult(
                distributed_cross_similarity(
                    np.asarray(a), np.asarray(b), devices, metric=metric
                )
            )
    return AsyncResult(cross_similarity(a, b, metric=metric))


def crossTanimotoSimilarity(
    fingerprint_group_one, fingerprint_group_two=None, hardwareOptions=None,
    stream=None,
) -> AsyncResult:
    check_stream_arg(stream)
    a = _as_packed(fingerprint_group_one)
    b = a if fingerprint_group_two is None else _as_packed(fingerprint_group_two)
    return _cross(a, b, "tanimoto", hardwareOptions)


def crossCosineSimilarity(
    fingerprint_group_one, fingerprint_group_two=None, hardwareOptions=None,
    stream=None,
) -> AsyncResult:
    check_stream_arg(stream)
    a = _as_packed(fingerprint_group_one)
    b = a if fingerprint_group_two is None else _as_packed(fingerprint_group_two)
    return _cross(a, b, "cosine", hardwareOptions)


def crossTanimotoSimilarityMemoryConstrained(
    fingerprint_group_one,
    fingerprint_group_two=None,
    maxDeviceMemoryBytes: int = 2 << 30,
) -> np.ndarray:
    a = np.asarray(_as_packed(fingerprint_group_one))
    b = a if fingerprint_group_two is None else np.asarray(_as_packed(fingerprint_group_two))
    return cross_similarity_chunked(
        a, b, metric="tanimoto", max_device_memory_bytes=maxDeviceMemoryBytes
    )


def crossCosineSimilarityMemoryConstrained(
    fingerprint_group_one,
    fingerprint_group_two=None,
    maxDeviceMemoryBytes: int = 2 << 30,
) -> np.ndarray:
    a = np.asarray(_as_packed(fingerprint_group_one))
    b = a if fingerprint_group_two is None else np.asarray(_as_packed(fingerprint_group_two))
    return cross_similarity_chunked(
        a, b, metric="cosine", max_device_memory_bytes=maxDeviceMemoryBytes
    )
