"""Butina clustering kernels.

TPU-native redesign of the reference's two Butina paths (SURVEY.md §2.5):

* :func:`butina_matrix` — distance/hit-matrix path. The reference runs
  the main loop device-side via CUDA Graphs with conditional nodes
  (``src/butina.cu:653-886``); here the whole loop is a single
  ``lax.while_loop`` inside one jitted program — zero host round-trips.
* :func:`fused_butina_kernel` — O(N)-memory path over packed
  fingerprints (the reference's Triton ``_fusedButina.py:30-346``):
  neighbor counts are maintained incrementally with MXU matmuls against
  the freshly extracted cluster members instead of materializing the
  N x N matrix.

Semantics (matching the reference / RDKit ``Butina.ClusterData``):
repeatedly pick the free item with the most free neighbors (ties ->
highest index, the reference's "argmax-last", ``butina.cu:457``), form a
cluster from it and its free neighbors, until the best count is 1; then
every remaining free item becomes a singleton. Output cluster ids are
renumbered so cluster 0 is the largest.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from nvmolkit_tpu.ops.packed_bits import popcount_rows, unpack_bits


def _argmax_last(x: jnp.ndarray) -> jnp.ndarray:
    """Index of the maximum; ties broken towards the highest index."""
    n = x.shape[0]
    rev = x[::-1]
    return (n - 1) - jnp.argmax(rev)


@functools.partial(jax.jit, static_argnames=())
def butina_matrix(hits: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Cluster from a dense boolean neighbor matrix.

    ``hits[i, j]`` must be True iff items i and j are neighbors (the
    diagonal is forced True). Returns ``(cluster_ids, centroids, n_clusters)``
    where ``cluster_ids[i]`` is the size-renumbered cluster of item i and
    ``centroids[k]`` is the center item of (formation-order) cluster k.
    """
    n = hits.shape[0]
    eye = jnp.eye(n, dtype=bool)
    hits = hits | eye

    # counts are carried in the loop state and updated incrementally:
    # removing the new cluster's members decrements each row by its
    # overlap with the member set (one masked row-sum per iteration
    # instead of recomputing the full N^2 sum in cond AND body)
    def cond(state):
        counts = state[4]
        return jnp.max(counts) > 1

    def body(state):
        free, cluster_raw, centroids, k, counts = state
        center = _argmax_last(counts)
        members = hits[center] & free
        cluster_raw = jnp.where(members, k, cluster_raw)
        centroids = centroids.at[k].set(center)
        free = free & ~members
        delta = (hits & members[None, :]).sum(axis=1)
        counts = jnp.where(free, counts - delta, 0)
        return free, cluster_raw, centroids, k + 1, counts

    free0 = jnp.ones(n, dtype=bool)
    cluster0 = jnp.full(n, -1, dtype=jnp.int32)
    centroids0 = jnp.full(n, -1, dtype=jnp.int32)
    counts0 = hits.sum(axis=1).astype(jnp.int32)
    free, cluster_raw, centroids, k, _ = jax.lax.while_loop(
        cond, body, (free0, cluster0, centroids0, jnp.int32(0), counts0)
    )

    # singletons: remaining free items, assigned in index order
    singleton_rank = jnp.cumsum(free) - 1
    cluster_raw = jnp.where(free, k + singleton_rank.astype(jnp.int32), cluster_raw)
    centroids = jnp.where(
        (jnp.arange(n) >= k) & (jnp.arange(n) < k + free.sum()),
        jnp.nonzero(free, size=n, fill_value=-1)[0][
            jnp.clip(jnp.arange(n) - k, 0, n - 1)
        ],
        centroids,
    )
    n_clusters = k + free.sum().astype(jnp.int32)

    # renumber by size (desc), stable in formation order
    sizes = jnp.bincount(cluster_raw, length=n)
    order = jnp.argsort(-sizes, stable=True)          # new -> old
    rank = jnp.argsort(order, stable=True)            # old -> new
    cluster_ids = rank[cluster_raw].astype(jnp.int32)
    centroids_sorted = centroids[order]
    return cluster_ids, centroids_sorted, n_clusters


def butina_cpu(hits: np.ndarray) -> tuple[np.ndarray, np.ndarray, int]:
    """numpy reference oracle with identical semantics."""
    n = hits.shape[0]
    hits = hits | np.eye(n, dtype=bool)
    free = np.ones(n, dtype=bool)
    cluster = np.full(n, -1, dtype=np.int64)
    centroids: list[int] = []
    k = 0
    while True:
        counts = np.where(free, (hits & free[None, :]).sum(axis=1), 0)
        best = counts.max()
        if best <= 1:
            break
        center = n - 1 - int(np.argmax(counts[::-1]))
        members = hits[center] & free
        cluster[members] = k
        centroids.append(center)
        free &= ~members
        k += 1
    for i in np.nonzero(free)[0]:
        cluster[i] = k
        centroids.append(int(i))
        k += 1
    sizes = np.bincount(cluster, minlength=k)
    order = np.argsort(-sizes, kind="stable")
    rank = np.argsort(order, kind="stable")
    return rank[cluster].astype(np.int32), np.asarray(centroids)[order], k


@functools.partial(jax.jit, static_argnames=("metric", "member_chunk"))
def fused_butina_kernel(
    fps: jnp.ndarray,  # [N, W] packed uint32
    threshold: float,  # similarity threshold (neighbor iff sim >= threshold)
    *,
    metric: str = "tanimoto",
    member_chunk: int = 512,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """O(N)-memory Butina over packed fingerprints.

    Never materializes the N x N matrix: initial neighbor counts come from
    a chunked MXU sweep; after each cluster extraction, counts are
    decremented by the members' contributions (one [N, member_chunk]
    matmul per chunk of the new cluster).
    """
    n, w = fps.shape
    bits = unpack_bits(fps, dtype=jnp.bfloat16)  # [N, K]
    pop = popcount_rows(fps).astype(jnp.float32)  # [N]

    def hit_block(rows_bits, rows_pop, row_valid):
        """[N, R] bool: is (j, r) a neighbor pair (sim >= threshold)."""
        c = jnp.dot(bits, rows_bits.T, preferred_element_type=jnp.float32)
        if metric == "tanimoto":
            denom = pop[:, None] + rows_pop[None, :] - c
        else:  # cosine
            denom = jnp.sqrt(pop[:, None] * rows_pop[None, :])
        sim = jnp.where(denom > 0, c / denom, 0.0)
        return (sim >= threshold) & row_valid[None, :]

    # initial counts: chunked sweep over columns
    chunk = member_chunk
    n_pad = ((n + chunk - 1) // chunk) * chunk
    pad = n_pad - n
    bits_p = jnp.pad(bits, ((0, pad), (0, 0)))
    pop_p = jnp.pad(pop, (0, pad))
    valid_p = jnp.arange(n_pad) < n

    def count_chunk(carry, idx):
        start = idx * chunk
        rb = jax.lax.dynamic_slice_in_dim(bits_p, start, chunk, 0)
        rp = jax.lax.dynamic_slice_in_dim(pop_p, start, chunk, 0)
        rv = jax.lax.dynamic_slice_in_dim(valid_p, start, chunk, 0)
        carry = carry + hit_block(rb, rp, rv).sum(axis=1, dtype=jnp.int32)
        return carry, None

    counts0, _ = jax.lax.scan(
        count_chunk, jnp.zeros(n, dtype=jnp.int32), jnp.arange(n_pad // chunk)
    )

    def cond(state):
        free, counts, _, _, _ = state
        return jnp.max(jnp.where(free, counts, 0)) > 1

    def body(state):
        free, counts, cluster_raw, centroids, k = state
        masked = jnp.where(free, counts, 0)
        center = _argmax_last(masked)
        members = hit_block(bits[center][None, :], pop[center][None], jnp.ones(1, bool))[:, 0]
        members = members & free
        members = members.at[center].set(True)
        cluster_raw = jnp.where(members, k, cluster_raw)
        centroids = centroids.at[k].set(center)
        free = free & ~members

        # decrement counts by member contributions, member_chunk at a time.
        # Member indices come from a key-value sort (members first), NOT
        # jnp.nonzero — nonzero lowers to a scatter that serializes on TPU
        # and dominated the loop (~0.5 s/cluster at N=100k).
        iota = jnp.arange(n, dtype=jnp.int32)
        _, member_idx = jax.lax.sort_key_val((~members).astype(jnp.int32), iota)
        if n % chunk:  # allow dynamic_slice chunks on small inputs
            member_idx = jnp.pad(member_idx, (0, chunk - n % chunk))
        n_members = members.sum()

        def dec_loop(i, c):
            start = i * chunk
            idx = jax.lax.dynamic_slice_in_dim(member_idx, start, chunk, 0)
            valid = (start + jnp.arange(chunk, dtype=jnp.int32)) < n_members
            rb = bits[idx]
            rp = pop[idx]
            delta = hit_block(rb, rp, valid).sum(axis=1, dtype=jnp.int32)
            return c - delta

        n_chunks = (n_members + chunk - 1) // chunk
        counts = jax.lax.fori_loop(0, n_chunks, dec_loop, counts)
        return free, counts, cluster_raw, centroids, k + 1

    free0 = jnp.ones(n, dtype=bool)
    cluster0 = jnp.full(n, -1, dtype=jnp.int32)
    centroids0 = jnp.full(n, -1, dtype=jnp.int32)
    free, counts, cluster_raw, centroids, k = jax.lax.while_loop(
        cond, body, (free0, counts0, cluster0, centroids0, jnp.int32(0))
    )

    singleton_rank = jnp.cumsum(free) - 1
    cluster_raw = jnp.where(free, k + singleton_rank.astype(jnp.int32), cluster_raw)
    free_idx = jnp.nonzero(free, size=n, fill_value=-1)[0]
    centroids = jnp.where(
        (jnp.arange(n) >= k) & (jnp.arange(n) < k + free.sum()),
        free_idx[jnp.clip(jnp.arange(n) - k, 0, n - 1)],
        centroids,
    )
    n_clusters = k + free.sum().astype(jnp.int32)

    sizes = jnp.bincount(cluster_raw, length=n)
    order = jnp.argsort(-sizes, stable=True)
    rank = jnp.argsort(order, stable=True)
    return rank[cluster_raw].astype(jnp.int32), centroids[order], n_clusters
