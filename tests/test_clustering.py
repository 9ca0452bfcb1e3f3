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
