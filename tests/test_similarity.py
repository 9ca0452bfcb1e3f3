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


# ---------------------------------------------------------------------------
# round 4: independent scalar oracle + shape/boundary properties
# ---------------------------------------------------------------------------
#
# cross_similarity_cpu is part of the package; the oracle below is
# implemented HERE from the definition (python ints, bin().count()),
# so a shared bug cannot hide (the reference's differential strategy,
# tests/integration/test_fp_sim_workflow.cpp:30-78).


def _popcount_rows(fps: np.ndarray) -> list[list[int]]:
    return [[int(w) for w in row] for row in np.asarray(fps, np.uint32)]


def _scalar_tanimoto(a_row, b_row) -> float:
    inter = sum(bin(x & y).count("1") for x, y in zip(a_row, b_row))
    union = sum(bin(x | y).count("1") for x, y in zip(a_row, b_row))
    return inter / union if union else 0.0


def _scalar_cosine(a_row, b_row) -> float:
    inter = sum(bin(x & y).count("1") for x, y in zip(a_row, b_row))
    na = sum(bin(x).count("1") for x in a_row)
    nb = sum(bin(x).count("1") for x in b_row)
    return inter / ((na * nb) ** 0.5) if na and nb else 0.0


def _random_fps(rng, n, words, density=0.3):
    bits = rng.random((n, words * 32)) < density
    out = np.zeros((n, words), np.uint32)
    for w in range(words):
        for b in range(32):
            out[:, w] |= bits[:, w * 32 + b].astype(np.uint32) << np.uint32(b)
    return out


@pytest.mark.parametrize("n,m,words", [(1, 1, 1), (3, 5, 2), (33, 7, 7),
                                       (127, 129, 4), (64, 64, 64)])
def test_scalar_oracle_random_shapes(rng, n, m, words):
    a = _random_fps(rng, n, words)
    b = _random_fps(rng, m, words)
    got_t = crossTanimotoSimilarity(a, b).numpy()
    got_c = crossCosineSimilarity(a, b).numpy()
    ar, br = _popcount_rows(a), _popcount_rows(b)
    for i in range(0, n, max(1, n // 9)):
        for j in range(0, m, max(1, m // 9)):
            assert got_t[i, j] == pytest.approx(
                _scalar_tanimoto(ar[i], br[j]), abs=1e-6
            ), (n, m, words, i, j)
            assert got_c[i, j] == pytest.approx(
                _scalar_cosine(ar[i], br[j]), abs=1e-6
            )


def test_symmetry_and_range(rng):
    fps = _random_fps(rng, 50, 8)
    s = crossTanimotoSimilarity(fps).numpy()
    np.testing.assert_allclose(s, s.T, atol=1e-7)
    assert (s >= 0).all() and (s <= 1 + 1e-7).all()
    c = crossCosineSimilarity(fps).numpy()
    np.testing.assert_allclose(c, c.T, atol=1e-7)
    assert (c >= 0).all() and (c <= 1 + 1e-6).all()
    # cosine >= tanimoto pointwise: inter/sqrt(na*nb) >= inter/union
    # since union = na + nb - inter >= sqrt(na*nb) when inter <= min
    assert (c >= s - 1e-6).all()


def test_all_ones_and_disjoint():
    ones = np.full((2, 4), 0xFFFFFFFF, np.uint32)
    s = crossTanimotoSimilarity(ones).numpy()
    np.testing.assert_allclose(s, 1.0, atol=1e-7)
    a = np.zeros((1, 2), np.uint32)
    b = np.zeros((1, 2), np.uint32)
    a[0, 0] = 0x0F0F0F0F
    b[0, 0] = 0xF0F0F0F0
    assert crossTanimotoSimilarity(a, b).numpy()[0, 0] == 0.0
    assert crossCosineSimilarity(a, b).numpy()[0, 0] == 0.0


def test_int32_view_equals_uint32(rng):
    fps = _random_fps(rng, 20, 4)
    as_i32 = fps.view(np.int32)
    np.testing.assert_array_equal(
        crossTanimotoSimilarity(fps).numpy(),
        crossTanimotoSimilarity(as_i32).numpy(),
    )


def test_async_result_passthrough(rng):
    from nvmolkit_tpu.types import AsyncResult

    fps = _random_fps(rng, 10, 4)
    wrapped = AsyncResult(np.asarray(fps))
    np.testing.assert_array_equal(
        crossTanimotoSimilarity(wrapped).numpy(),
        crossTanimotoSimilarity(fps).numpy(),
    )


def test_memory_constrained_tiny_budget_many_chunks(rng):
    # budget small enough to force a chunk PER ROW — exercises the
    # chunk-boundary arithmetic of cross_similarity_chunked
    fps = _random_fps(rng, 23, 3)
    full = crossTanimotoSimilarity(fps).numpy()
    tiny = crossTanimotoSimilarityMemoryConstrained(
        fps, maxDeviceMemoryBytes=23 * 8
    )
    np.testing.assert_allclose(tiny, full, atol=1e-6)
