"""Butina clustering tests vs the numpy oracle (and hand cases).

Mirrors the reference's ``test_clustering.py`` (vs RDKit Butina).
"""
import numpy as np
import pytest

from nvmolkit_tpu.clustering import butina, fused_butina
from nvmolkit_tpu.fingerprints import MorganFingerprintGenerator
from nvmolkit_tpu.ops.butina import butina_cpu
from nvmolkit_tpu.ops.similarity import cross_similarity_cpu


def _dist_from_points(points, rng=None):
    d = np.abs(points[:, None] - points[None, :])
    return d


def test_butina_hand_case():
    # points on a line: {0,1,2} cluster at cutoff 1.5 around 1; {10} singleton
    pts = np.array([0.0, 1.0, 2.0, 10.0])
    dist = _dist_from_points(pts)
    ids = butina(dist, cutoff=1.5).numpy()
    assert ids[0] == ids[1] == ids[2] == 0  # largest cluster renumbered 0
    assert ids[3] == 1


def test_butina_matches_cpu_random(rng):
    n = 60
    pts = rng.random((n, 2))
    dist = np.linalg.norm(pts[:, None] - pts[None, :], axis=-1)
    for cutoff in (0.1, 0.25, 0.5):
        got = butina(dist, cutoff=cutoff).numpy()
        want, _, _ = butina_cpu(dist <= cutoff)
        np.testing.assert_array_equal(got, want)


def test_butina_centroids(rng):
    n = 40
    pts = rng.random((n, 2))
    dist = np.linalg.norm(pts[:, None] - pts[None, :], axis=-1)
    ids_res, centroids = butina(dist, cutoff=0.3, return_centroids=True)
    ids = ids_res.numpy()
    want_ids, want_centroids, want_k = butina_cpu(dist <= 0.3)
    np.testing.assert_array_equal(ids, want_ids)
    np.testing.assert_array_equal(centroids, want_centroids)
    # each centroid belongs to its own cluster
    for k, c in enumerate(centroids):
        assert ids[c] == k


def test_butina_all_singletons():
    dist = np.full((5, 5), 10.0)
    np.fill_diagonal(dist, 0.0)
    ids = butina(dist, cutoff=1.0).numpy()
    assert sorted(ids.tolist()) == [0, 1, 2, 3, 4]


def test_butina_one_cluster():
    dist = np.zeros((7, 7))
    ids = butina(dist, cutoff=1.0).numpy()
    assert (ids == 0).all()


def test_fused_butina_matches_matrix_path(mols100):
    gen = MorganFingerprintGenerator(radius=2, fpSize=1024)
    fps = gen.GetFingerprintsCpu(mols100)
    cutoff = 0.6
    sim = cross_similarity_cpu(fps, fps, "tanimoto")
    dist = 1.0 - sim
    matrix_ids = butina(dist, cutoff=cutoff).numpy()
    clusters, sizes = fused_butina(fps, cutoff=cutoff)
    # same partition and same renumbering
    fused_ids = np.empty(len(mols100), dtype=np.int32)
    for k, members in enumerate(clusters):
        for i in members:
            fused_ids[i] = k
    np.testing.assert_array_equal(fused_ids, matrix_ids)
    assert sizes[0] == max(sizes)


def test_fused_butina_centroids(mols100):
    gen = MorganFingerprintGenerator(radius=2, fpSize=1024)
    fps = gen.GetFingerprintsCpu(mols100)
    clusters, sizes, centroids = fused_butina(fps, cutoff=0.5, return_centroids=True)
    assert len(centroids) == len(clusters)
    for members, c in zip(clusters, centroids):
        assert c in members


def test_butina_validation():
    with pytest.raises(ValueError):
        butina(np.zeros((3, 4)), cutoff=0.5)
    with pytest.raises(ValueError):
        fused_butina(np.zeros((3, 8), dtype=np.uint32), 0.5, metric="nope")


# ---------------------------------------------------------------------------
# round 4: independent in-test Butina oracle + boundary properties
# ---------------------------------------------------------------------------
#
# butina_cpu ships with the package; the oracle below re-implements the
# Butina 1999 algorithm HERE (argmax-LAST tie-break, renumber by size,
# centroid = the selected seed), so a shared bug cannot hide.


def _butina_oracle(hits: np.ndarray):
    """Classic Butina over a boolean neighbor matrix.

    Semantics (matches the reference GPU algorithm, butina.cu): extract
    clusters by LAST argmax of free-neighbor counts while the best
    count exceeds 1; once only singletons remain they are assigned in
    ASCENDING index order (the reference's dedicated singleton
    assignment kernel, butina.cu:281); finally renumber by size
    descending, stable in extraction order.
    """
    n = hits.shape[0]
    hits = hits.copy()
    np.fill_diagonal(hits, True)
    free = np.ones(n, bool)
    ids = np.full(n, -1, np.int64)
    centroids = []
    k = 0
    while True:
        counts = (hits & free[None, :]).sum(1) * free  # only free seeds
        if counts.max() <= 1:
            break
        best = int(np.flatnonzero(counts == counts.max())[-1])  # LAST max
        members = np.flatnonzero(hits[best] & free)
        ids[members] = k
        centroids.append(best)
        free[members] = False
        k += 1
    for i in np.flatnonzero(free):  # singletons: ascending index
        ids[i] = k
        centroids.append(int(i))
        k += 1
    # renumber by size desc (stable: earlier cluster wins ties)
    sizes = np.bincount(ids, minlength=k)
    order = np.argsort(-sizes, kind="stable")
    remap = np.empty(k, np.int64)
    remap[order] = np.arange(k)
    return remap[ids], [centroids[i] for i in order]


@pytest.mark.parametrize("n", [5, 63, 64, 65, 100])
def test_matrix_path_vs_independent_oracle(rng, n):
    pts = rng.random((n, 2))
    dist = np.linalg.norm(pts[:, None] - pts[None, :], axis=-1)
    for cutoff in (0.15, 0.35):
        got_ids, got_cent = butina(dist, cutoff=cutoff, return_centroids=True)
        want_ids, want_cent = _butina_oracle(dist <= cutoff)
        np.testing.assert_array_equal(got_ids.numpy(), want_ids)
        np.testing.assert_array_equal(got_cent, want_cent)


def test_argmax_last_tie_break():
    # two disjoint pairs: (0,1) and (2,3) both have 2 neighbors; the
    # reference picks the LAST argmax (butina.cu lastArgMaxKernel), so
    # the (2,3) pair is extracted first but renumbering is stable by size
    hits = np.zeros((4, 4), bool)
    hits[0, 1] = hits[1, 0] = True
    hits[2, 3] = hits[3, 2] = True
    dist = np.where(hits, 0.1, 5.0)
    np.fill_diagonal(dist, 0.0)
    ids_res, cents = butina(dist, cutoff=1.0, return_centroids=True)
    want_ids, want_cents = _butina_oracle(dist <= 1.0)
    np.testing.assert_array_equal(ids_res.numpy(), want_ids)
    np.testing.assert_array_equal(cents, want_cents)
    assert want_cents[0] == 3  # last-max seed extracted first


def test_cutoff_boundary_is_inclusive():
    # distance EXACTLY equal to cutoff is a neighbor (<=)
    dist = np.array([[0.0, 0.5], [0.5, 0.0]])
    ids = butina(dist, cutoff=0.5).numpy()
    assert ids[0] == ids[1]
    ids = butina(dist, cutoff=0.49999).numpy()
    assert ids[0] != ids[1]


def test_cluster_sizes_descending(rng):
    n = 80
    pts = rng.random((n, 1))
    dist = np.abs(pts[:, None, 0] - pts[None, :, 0])
    ids = butina(dist, cutoff=0.05).numpy()
    sizes = np.bincount(ids)
    assert (np.diff(sizes) <= 0).all()  # cluster 0 largest, descending


def test_members_within_cutoff_of_centroid(rng):
    n = 70
    pts = rng.random((n, 2))
    dist = np.linalg.norm(pts[:, None] - pts[None, :], axis=-1)
    cutoff = 0.3
    ids_res, cents = butina(dist, cutoff=cutoff, return_centroids=True)
    ids = ids_res.numpy()
    for k, c in enumerate(cents):
        members = np.flatnonzero(ids == k)
        assert (dist[c, members] <= cutoff + 1e-12).all()


@pytest.mark.parametrize("n", [63, 64, 65, 127, 128, 129])
def test_fused_path_bucket_boundaries(n):
    rng = np.random.default_rng(8800 + n)  # own seed: reproducible per case
    base = (rng.integers(0, 2**32, (8, 8), dtype=np.uint64)).astype(np.uint32)
    # draw rows near a handful of base patterns so real clusters exist
    fps = base[rng.integers(0, 8, n)]
    flips = rng.integers(0, 2**32, (n, 8), dtype=np.uint64).astype(np.uint32)
    flips &= rng.integers(0, 2**32, (n, 8), dtype=np.uint64).astype(np.uint32)
    flips &= rng.integers(0, 2**32, (n, 8), dtype=np.uint64).astype(np.uint32)
    fps = fps ^ flips
    cutoff = 0.45
    from nvmolkit_tpu.ops.similarity import cross_similarity_cpu as _sim

    dist = 1.0 - _sim(fps, fps, "tanimoto")
    want_ids, _ = _butina_oracle(dist <= cutoff)
    clusters, sizes = fused_butina(fps, cutoff=cutoff)
    got_ids = np.empty(n, np.int64)
    for k, members in enumerate(clusters):
        for i in members:
            got_ids[i] = k
    np.testing.assert_array_equal(got_ids, want_ids)


def test_fused_cosine_matches_matrix(mols100):
    gen = MorganFingerprintGenerator(radius=2, fpSize=512)
    fps = gen.GetFingerprintsCpu(mols100)
    cutoff = 0.4
    sim = cross_similarity_cpu(fps, fps, "cosine")
    matrix_ids = butina(1.0 - sim, cutoff=cutoff).numpy()
    clusters, _sizes = fused_butina(fps, cutoff=cutoff, metric="cosine")
    fused_ids = np.empty(len(mols100), np.int64)
    for k, members in enumerate(clusters):
        for i in members:
            fused_ids[i] = k
    np.testing.assert_array_equal(fused_ids, matrix_ids)


def test_single_item_and_empty_like_cases():
    ids = butina(np.zeros((1, 1)), cutoff=0.5).numpy()
    assert ids.tolist() == [0]
    clusters, sizes = fused_butina(np.zeros((1, 4), np.uint32), 0.5)
    assert clusters == [(0,)]


def test_fused_epoch_window_large_tie_heavy():
    """n >> WIN with hundreds of equal-size (tie-heavy) clusters: forces
    many epoch-window rounds (WIN=128) including window invalidation on
    count ties, where argmax-last must still match the oracle exactly."""
    rng = np.random.default_rng(991)
    n_centers, copies = 96, 16
    centers = rng.integers(0, 2**32, (n_centers, 8), dtype=np.uint64).astype(np.uint32)
    # identical copies of each center -> within-cluster sims are 1.0 and
    # every member is a tied candidate center
    fps = np.repeat(centers, copies, axis=0)
    # plus isolated noise rows (singletons)
    noise = rng.integers(0, 2**32, (64, 8), dtype=np.uint64).astype(np.uint32)
    fps = np.concatenate([fps, noise])
    perm = rng.permutation(len(fps))
    fps = fps[perm]
    cutoff = 0.3
    from nvmolkit_tpu.ops.similarity import cross_similarity_cpu as _sim

    dist = 1.0 - _sim(fps, fps, "tanimoto")
    want_ids, _ = _butina_oracle(dist <= cutoff)
    clusters, sizes = fused_butina(fps, cutoff=cutoff)
    got_ids = np.empty(len(fps), np.int64)
    for k, members in enumerate(clusters):
        for i in members:
            got_ids[i] = k
    np.testing.assert_array_equal(got_ids, want_ids)
