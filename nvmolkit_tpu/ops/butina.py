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
    member_chunk: int = 128,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """O(N)-memory Butina over packed fingerprints.

    Never materializes the N x N matrix: initial neighbor counts come from
    a chunked MXU sweep; after each cluster extraction, counts are
    decremented by the members' contributions (one [N, member_chunk]
    matmul per chunk of the new cluster).

    The unpacked bit rows are int8 (exact int32 MXU accumulation, same
    trick as ops/similarity) — each extraction round streams the whole
    [N, K] bit tensor twice (center matvec + member decrement), so
    halving the element width against bf16 directly halves the round's
    HBM traffic, the dominant cost at N=100k.
    """
    n, w = fps.shape
    bits = unpack_bits(fps, dtype=jnp.int8)  # [N, K]
    pop = popcount_rows(fps).astype(jnp.float32)  # [N]

    def hit_block(rows_bits, rows_pop, row_valid):
        """[N, R] bool: is (j, r) a neighbor pair (sim >= threshold)."""
        c = jnp.dot(bits, rows_bits.T, preferred_element_type=jnp.int32)
        c = c.astype(jnp.float32)
        if metric == "tanimoto":
            denom = pop[:, None] + rows_pop[None, :] - c
        else:  # cosine
            denom = jnp.sqrt(pop[:, None] * rows_pop[None, :])
        sim = jnp.where(denom > 0, c / denom, 0.0)
        return (sim >= threshold) & row_valid[None, :]

    # initial counts: chunked sweep over columns. The sweep chunk is
    # deliberately LARGE (1024): every chunk's matmul streams the whole
    # [N, K] bit tensor once, so chunk width divides the total sweep
    # traffic — 128-wide chunks cost ~160 GB of HBM reads at N=100k,
    # 1024-wide ~20 GB. (The same applies to the epoch flush below.)
    chunk = max(member_chunk, min(1024, n))
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

    # --- epoch-window extraction loop ---------------------------------
    # Naive extraction costs two full [N, K] streams per cluster (a
    # center mat-VEC with one output lane of the MXU's 128, plus the
    # member-decrement matmul) — ~2 ms/cluster at N=100k, 4 s for 2k
    # clusters. Instead clusters are extracted in EPOCHS:
    #
    #   * epoch start (counts exact): pick the true argmax-last center
    #     plus the other top-(WIN-1) candidate centers, and prefetch all
    #     their hit COLUMNS with one well-shaped [N, K] @ [K, WIN]
    #     matmul. Hit rows are static, so a prefetched column masked by
    #     the live `free` is always the exact member set.
    #   * inner extractions use ONLY the window: per-candidate live
    #     counts are [N, WIN] column reductions (no matmul). Extraction
    #     m >= 1 runs only while the window's best live count STRICTLY
    #     exceeds the best epoch-start count outside the window — counts
    #     only ever decrease, so the outside bound is conservative and
    #     the global argmax-last is provably inside. Iteration 0 uses
    #     the exact global argmax, so every epoch extracts >= 1 cluster
    #     (no livelock in tie-heavy tails).
    #   * epoch end: ALL removed members' decrements flush in one
    #     batched chunked matmul, restoring exact counts.
    #
    # The per-cluster cost falls from two full streams to one [N, WIN]
    # reduction, with the matmuls amortized over the epoch. No lax.cond
    # anywhere: XLA:TPU flattens cheap side-effect-free conditionals to
    # execute-both-and-select inside while loops (measured 3x slower
    # end-to-end with a cond-guarded sort fallback, round 4).
    WIN = min(member_chunk, n)
    iota = jnp.arange(n, dtype=jnp.int32)
    k_top = min(chunk, n)

    def cond(state):
        free, counts, _, _, _ = state
        return jnp.max(jnp.where(free, counts, 0)) > 1

    def body(state):
        free, counts, cluster_raw, centroids, k = state
        free_in = free
        masked = jnp.where(free, counts, 0)

        # window: exact argmax-last first, then the top-(WIN-1) others
        # by (count, index) descending — on count ties argmax-last picks
        # the HIGHEST index, so high-index rows must be preferred or
        # tie-heavy data (equal-size clusters) would invalidate the
        # window after one extraction. The selection key packs
        # min(count, 2^15-1) and index>>2 into int32 (selection quality
        # only — exactness comes from the separate bound check below).
        center0 = _argmax_last(masked)
        sel_key = jnp.minimum(masked, 32767) * 32768 + (iota >> 2)
        sel_key = jnp.where(masked > 0, sel_key, -1)
        _, cand_rest = jax.lax.top_k(sel_key, WIN)
        win_centers = jnp.concatenate([center0[None], cand_rest[: WIN - 1]])
        H = hit_block(bits[win_centers], pop[win_centers], jnp.ones(WIN, bool))
        # epoch-start bound OUTSIDE the window: (max count, max index at
        # that count). Counts only decrease, so for the whole epoch
        # every non-window row is lexicographically <= this pair.
        out_masked = masked.at[win_centers].set(0)
        cb_out = jnp.max(out_masked)
        cb_idx_out = jnp.max(jnp.where(out_masked == cb_out, iota, -1))

        def ext_cond(carry):
            free, cluster_raw, centroids, k, m, live = carry
            return live & (m < WIN)

        def ext_body(carry):
            free, cluster_raw, centroids, k, m, live = carry
            counts_win = jnp.sum(H & free[:, None], axis=0, dtype=jnp.int32)
            # a candidate absorbed into an earlier cluster this epoch is
            # no longer eligible as a center, even though its free
            # neighbors still give its column a positive count
            counts_win = jnp.where(free[win_centers], counts_win, 0)
            maxc = jnp.max(counts_win)
            # argmax-last by ITEM index among max-count candidates
            cands = jnp.where(counts_win == maxc, win_centers, -1)
            center = jnp.where(m == 0, center0, jnp.max(cands))
            # proceed iff provably still the global argmax-last:
            # (maxc, center) must lexicographically beat the outside
            # bound (iteration 0 is the exact argmax by construction)
            beats = (maxc > cb_out) | ((maxc == cb_out) & (center > cb_idx_out))
            live = live & (beats | (m == 0)) & (maxc > 1)
            pos = jnp.argmax(win_centers == center)
            members = H[:, pos] & free
            members = members.at[center].set(True)
            members = members & live
            cluster_raw = jnp.where(members, k, cluster_raw)
            centroids = jnp.where(
                live, centroids.at[k].set(center), centroids
            )
            free = free & ~members
            k = k + live.astype(jnp.int32)
            return free, cluster_raw, centroids, k, m + 1, live

        free, cluster_raw, centroids, k, _, _ = jax.lax.while_loop(
            ext_cond, ext_body,
            (free, cluster_raw, centroids, k, jnp.int32(0), jnp.bool_(True)),
        )

        # flush: one batched decrement for everything removed this epoch
        removed = free_in & ~free
        n_removed = removed.sum()

        def dec_loop(i, carry):
            c, rem = carry
            keys = jnp.where(rem, iota, jnp.int32(-1))
            _, idx = jax.lax.top_k(keys, k_top)
            valid = jnp.arange(k_top, dtype=jnp.int32) < rem.sum()
            delta = hit_block(bits[idx], pop[idx], valid).sum(
                axis=1, dtype=jnp.int32
            )
            rem = rem & ~jnp.zeros_like(rem).at[idx].set(valid)
            return c - delta, rem

        n_chunks = (n_removed + k_top - 1) // k_top
        counts, _ = jax.lax.fori_loop(0, n_chunks, dec_loop, (counts, removed))
        return free, counts, cluster_raw, centroids, k

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
