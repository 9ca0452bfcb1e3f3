"""Similarity tests: MXU path vs numpy float64 oracle.

Mirrors the reference's ``test_similarity.py`` (vs BulkTanimotoSimilarity)
and the FP->similarity integration workflow
(``tests/integration/test_fp_sim_workflow.cpp:30-78``, 1e-5 tolerance).
"""
import numpy as np
import pytest

from nvmolkit_tpu.fingerprints import MorganFingerprintGenerator
from nvmolkit_tpu.ops.similarity import cross_similarity_cpu
from nvmolkit_tpu.similarity import (
    crossCosineSimilarity,
    crossCosineSimilarityMemoryConstrained,
    crossTanimotoSimilarity,
    crossTanimotoSimilarityMemoryConstrained,
)


@pytest.fixture(scope="module")
def packed_fps(request):
    mols = request.getfixturevalue("mols100")
    gen = MorganFingerprintGenerator(radius=2, fpSize=1024)
    return gen.GetFingerprintsCpu(mols)


def test_tanimoto_matches_oracle(packed_fps):
    got = crossTanimotoSimilarity(packed_fps).numpy()
    want = cross_similarity_cpu(packed_fps, packed_fps, "tanimoto")
    assert got.shape == (100, 100)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_tanimoto_diagonal_is_one(packed_fps):
    got = crossTanimotoSimilarity(packed_fps).numpy()
    np.testing.assert_allclose(np.diag(got), 1.0, atol=1e-6)


def test_tanimoto_rectangular(packed_fps):
    got = crossTanimotoSimilarity(packed_fps[:30], packed_fps[30:]).numpy()
    want = cross_similarity_cpu(packed_fps[:30], packed_fps[30:], "tanimoto")
    assert got.shape == (30, 70)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_cosine_matches_oracle(packed_fps):
    got = crossCosineSimilarity(packed_fps).numpy()
    want = cross_similarity_cpu(packed_fps, packed_fps, "cosine")
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_zero_fingerprint_rows():
    fps = np.zeros((3, 32), dtype=np.uint32)
    fps[0, 0] = 0b1011
    got = crossTanimotoSimilarity(fps).numpy()
    assert got[1, 1] == 0.0  # 0/0 defined as 0
    assert got[0, 1] == 0.0
    assert got[0, 0] == 1.0


def test_memory_constrained_matches(packed_fps):
    full = crossTanimotoSimilarity(packed_fps).numpy()
    chunked = crossTanimotoSimilarityMemoryConstrained(
        packed_fps, maxDeviceMemoryBytes=100 * 100 * 4 // 5
    )
    np.testing.assert_allclose(chunked, full, atol=1e-6)
    cos_full = crossCosineSimilarity(packed_fps).numpy()
    cos_chunked = crossCosineSimilarityMemoryConstrained(
        packed_fps, maxDeviceMemoryBytes=100 * 100 * 4 // 5
    )
    np.testing.assert_allclose(cos_chunked, cos_full, atol=1e-6)


def test_exact_counts_small():
    # hand-checkable case: a=1100, b=0110 (within one word)
    a = np.array([[0b0011]], dtype=np.uint32)  # bits 0,1
    b = np.array([[0b0110]], dtype=np.uint32)  # bits 1,2
    sim = crossTanimotoSimilarity(a, b).numpy()[0, 0]
    assert sim == pytest.approx(1 / 3)  # common=1, union=3


def test_input_validation():
    with pytest.raises(ValueError):
        crossTanimotoSimilarity(np.zeros((3, 4, 5), dtype=np.uint32))
    with pytest.raises(ValueError):
        crossTanimotoSimilarity(np.zeros((3, 4), dtype=np.float32))


def test_pallas_tanimoto_matches_xla(packed_fps):
    """Pallas fused kernel (interpret mode on CPU) vs the f64 oracle."""
    from nvmolkit_tpu.ops.pallas_similarity import cross_tanimoto_pallas

    fps = np.concatenate([packed_fps] * 3)[:256]  # pad to block multiple
    got = np.asarray(cross_tanimoto_pallas(fps, fps, block=128, interpret=True))
    want = cross_similarity_cpu(fps, fps, "tanimoto")
    np.testing.assert_allclose(got, want, atol=1e-5)
