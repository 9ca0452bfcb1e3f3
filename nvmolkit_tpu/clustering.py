"""Butina clustering — public API.

Mirrors the reference's ``nvmolkit/clustering.py:41-189``:

* :func:`butina` — distance-matrix path: one jitted device-side loop
  (the reference uses CUDA Graphs with conditional nodes to the same
  end, ``src/butina.cu:653-886``).
* :func:`fused_butina` — O(N)-memory fingerprints->clusters path with no
  host round-trip (the reference's Triton path, ``nvmolkit/_fusedButina.py``).

Cluster ids are renumbered so cluster 0 is the largest.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from nvmolkit_tpu.ops.butina import butina_matrix, fused_butina_kernel
from nvmolkit_tpu.types import AsyncResult, check_stream_arg


def butina(
    distance_matrix,
    cutoff: float,
    neighborlist_max_size: int = 64,
    return_centroids: bool = False,
    stream=None,
):
    """Cluster items whose pairwise distance is <= ``cutoff``.

    ``distance_matrix`` is a dense (n, n) array (or AsyncResult). Returns
    an AsyncResult of int32 cluster ids (cluster 0 largest), plus the
    centroid item of each cluster when ``return_centroids``.

    ``neighborlist_max_size`` is accepted for reference API parity; the
    TPU path does not need the small-cluster neighborlist fast path.
    """
    check_stream_arg(stream)
    del neighborlist_max_size
    if isinstance(distance_matrix, AsyncResult):
        distance_matrix = distance_matrix.jax()
    d = jnp.asarray(distance_matrix)
    if d.ndim != 2 or d.shape[0] != d.shape[1]:
        raise ValueError(f"distance matrix must be square, got {d.shape}")
    hits = d <= cutoff
    cluster_ids, centroids, n_clusters = butina_matrix(hits)
    if return_centroids:
        n = int(n_clusters)
        return AsyncResult(cluster_ids), np.asarray(centroids)[:n]
    return AsyncResult(cluster_ids)


def fused_butina(
    x,
    cutoff: float,
    return_centroids: bool = False,
    stream=None,
    metric: str = "tanimoto",
):
    """Fingerprints -> clusters without materializing the N x N matrix.

    ``x`` is packed uint32 fingerprints (n, words) (or AsyncResult).
    ``cutoff`` is a *distance* cutoff: items are neighbors iff
    ``1 - sim >= ...`` i.e. ``sim >= 1 - cutoff`` (matching the reference's
    fused path semantics). Returns ``(clusters, cluster_sizes[, centroids])``
    where ``clusters`` is a list of index tuples sorted by size desc.
    """
    check_stream_arg(stream)
    if metric not in ("tanimoto", "cosine"):
        raise ValueError(f"unknown metric {metric!r}")
    if isinstance(x, AsyncResult):
        x = x.jax()
    fps = jnp.asarray(x)
    if fps.dtype == jnp.int32:
        fps = fps.view(jnp.uint32)
    threshold = 1.0 - cutoff
    cluster_ids, centroids, n_clusters = fused_butina_kernel(
        fps, threshold, metric=metric
    )
    ids = np.asarray(cluster_ids)
    n = int(n_clusters)
    clusters = [tuple(np.nonzero(ids == k)[0].tolist()) for k in range(n)]
    sizes = np.asarray([len(c) for c in clusters])
    if return_centroids:
        return clusters, sizes, np.asarray(centroids)[:n]
    return clusters, sizes
