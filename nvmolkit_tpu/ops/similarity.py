"""Cross Tanimoto/cosine similarity over packed bit-vector fingerprints.

TPU-native redesign of the reference's similarity kernels
(``src/similarity_kernels.cu:33-801``). The reference's fast path is b1
tensor-core BMMA (``m16n8k256 .b1 {and,xor}.popc``); the TPU equivalent
is an MXU matmul over the unpacked bits:

    popcount(a AND b) = <bits_a, bits_b>          (one matmul)
    popcount(a)       = row popcount (VPU bit-twiddling on packed words)
    tanimoto          = c / (|a| + |b| - c)
    cosine            = c / sqrt(|a| * |b|)

Bits are unpacked to bf16 {0,1}; with ``preferred_element_type=float32``
the MXU accumulates exactly (counts <= 4096 << 2^24), so results are
exact integer counts and the similarity is correct to f32 rounding of a
single division. An int8 operand path is available via ``dtype``.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from nvmolkit_tpu.ops.packed_bits import popcount_rows, unpack_bits, unpack_bits_np


@functools.partial(jax.jit, static_argnames=("metric", "dtype"))
def cross_similarity(
    fps_a: jnp.ndarray,  # [n, W] uint32 packed
    fps_b: jnp.ndarray,  # [m, W] uint32 packed
    *,
    metric: str = "tanimoto",
    dtype=jnp.int8,
) -> jnp.ndarray:
    """Dense [n, m] float32 similarity matrix on the MXU.

    ``dtype`` selects the MXU operand type for the unpacked bits. int8
    (default) runs at 2x the bf16 MXU rate and accumulates exactly in
    int32; bf16 accumulates exactly in f32 (counts <= 4096 << 2^24).
    Measured on TPU v5e: int8 ~1.5x faster end-to-end than bf16.
    """
    bits_a = unpack_bits(fps_a, dtype=dtype)  # [n, K]
    bits_b = unpack_bits(fps_b, dtype=dtype)  # [m, K]
    acc_t = jnp.int32 if jnp.issubdtype(dtype, jnp.integer) else jnp.float32
    common = jnp.dot(bits_a, bits_b.T, preferred_element_type=acc_t).astype(
        jnp.float32
    )  # exact AND-popcounts
    pa = popcount_rows(fps_a).astype(jnp.float32)  # [n]
    pb = popcount_rows(fps_b).astype(jnp.float32)  # [m]
    if metric == "tanimoto":
        denom = pa[:, None] + pb[None, :] - common
    elif metric == "cosine":
        denom = jnp.sqrt(pa[:, None] * pb[None, :])
    else:
        raise ValueError(f"unknown metric {metric!r}")
    return jnp.where(denom > 0, common / denom, 0.0)


def cross_similarity_chunked(
    fps_a: np.ndarray,
    fps_b: np.ndarray,
    *,
    metric: str = "tanimoto",
    max_device_memory_bytes: int = 2 << 30,
    dtype=jnp.int8,
) -> np.ndarray:
    """Memory-constrained host-output variant.

    Mirrors the reference's ``CrossSimilarityOptions.maxDeviceMemoryBytes``
    chunking (``src/similarity.h:29-32``): the [n, m] output is produced in
    row blocks so device memory stays bounded; each block's transfer
    overlaps the next block's compute via XLA async dispatch.
    """
    n, m = fps_a.shape[0], fps_b.shape[0]
    # block output (f32) is the dominant allocation; keep two in flight
    rows_per_chunk = max(1, int(max_device_memory_bytes // (2 * 4 * max(m, 1))))
    fps_b_dev = jnp.asarray(fps_b)
    out = np.empty((n, m), dtype=np.float32)
    pending: list[tuple[int, int, jax.Array]] = []
    for start in range(0, n, rows_per_chunk):
        stop = min(start + rows_per_chunk, n)
        block = cross_similarity(
            jnp.asarray(fps_a[start:stop]), fps_b_dev, metric=metric, dtype=dtype
        )
        pending.append((start, stop, block))
        if len(pending) > 2:
            s, e, b = pending.pop(0)
            out[s:e] = np.asarray(b)
    for s, e, b in pending:
        out[s:e] = np.asarray(b)
    return out


def cross_similarity_cpu(
    fps_a: np.ndarray, fps_b: np.ndarray, metric: str = "tanimoto"
) -> np.ndarray:
    """numpy reference oracle (float64)."""
    bits_a = unpack_bits_np(fps_a).astype(np.float64)
    bits_b = unpack_bits_np(fps_b).astype(np.float64)
    common = bits_a @ bits_b.T
    pa = bits_a.sum(axis=1)
    pb = bits_b.sum(axis=1)
    if metric == "tanimoto":
        denom = pa[:, None] + pb[None, :] - common
    elif metric == "cosine":
        denom = np.sqrt(pa[:, None] * pb[None, :])
    else:
        raise ValueError(f"unknown metric {metric!r}")
    with np.errstate(invalid="ignore", divide="ignore"):
        out = np.where(denom > 0, common / denom, 0.0)
    return out
