"""Morgan fingerprint tests: JAX batched kernel vs numpy reference oracle.

Mirrors the reference's differential strategy
(``tests/test_morgan_fingerprint.cpp``: GPU bit-exact vs RDKit; here:
TPU-path bit-exact vs our CPU reference backend).
"""
import numpy as np
import pytest

from nvmolkit_tpu.chem import mol_from_smiles
from nvmolkit_tpu.fingerprints import (
    MorganFingerprintGenerator,
    pack_fingerprint,
    unpack_fingerprint,
)
from nvmolkit_tpu.ops.morgan_cpu import morgan_fingerprint_cpu


def test_pack_unpack_roundtrip(rng):
    bits = (rng.random((5, 2048)) < 0.1).astype(np.uint8)
    packed = pack_fingerprint(bits)
    assert packed.shape == (5, 64)
    assert packed.dtype == np.uint32
    np.testing.assert_array_equal(unpack_fingerprint(packed), bits)


def test_cpu_fp_basics():
    m = mol_from_smiles("CCO")
    fp = morgan_fingerprint_cpu(m, radius=2, fp_size=1024)
    assert fp.shape == (32,)
    assert fp.dtype == np.uint32
    n_on = int(np.unpackbits(fp.view(np.uint8)).sum())
    # 3 atoms, radius 2 -> at most 9 bits, at least 3 (round 0)
    assert 3 <= n_on <= 9


def test_cpu_fp_deterministic():
    m = mol_from_smiles("c1ccccc1O")
    a = morgan_fingerprint_cpu(m, radius=3, fp_size=2048)
    b = morgan_fingerprint_cpu(m, radius=3, fp_size=2048)
    np.testing.assert_array_equal(a, b)


def test_cpu_fp_symmetry_dedup():
    # benzene: all atoms identical -> 1 unique environment per radius,
    # but ring closure means radius-1 and radius-2 environments saturate.
    m = mol_from_smiles("c1ccccc1")
    fp = morgan_fingerprint_cpu(m, radius=2, fp_size=2048)
    n_on = int(np.unpackbits(fp.view(np.uint8)).sum())
    # round0: 1 unique bit; rounds 1-2: 1 unique env each (all atoms dup)
    assert n_on <= 3


def test_radius_zero():
    m = mol_from_smiles("CCO")
    gen = MorganFingerprintGenerator(radius=0, fpSize=512)
    fp = gen.GetFingerprint(m)
    n_on = int(np.unpackbits(fp.view(np.uint8)).sum())
    assert 2 <= n_on <= 3  # C(H3), C(H2), O environments; two carbons differ


@pytest.mark.parametrize("radius", [1, 2, 3])
@pytest.mark.parametrize("fp_size", [512, 2048])
def test_jax_matches_cpu(mols100, radius, fp_size):
    gen = MorganFingerprintGenerator(radius=radius, fpSize=fp_size)
    cpu = gen.GetFingerprintsCpu(mols100)
    acc = gen.GetFingerprints(mols100).numpy()
    np.testing.assert_array_equal(acc, cpu)


def test_bucketing_preserves_order():
    smiles = ["C", "c1ccccc1" * 4, "CCO", "C" * 40]  # mixed sizes
    mols = [mol_from_smiles(s) for s in smiles]
    gen = MorganFingerprintGenerator(radius=2, fpSize=1024)
    acc = gen.GetFingerprints(mols).numpy()
    cpu = gen.GetFingerprintsCpu(mols)
    np.testing.assert_array_equal(acc, cpu)


def test_invalid_args():
    with pytest.raises(ValueError):
        MorganFingerprintGenerator(radius=2, fpSize=100)
    with pytest.raises(ValueError):
        MorganFingerprintGenerator(radius=-1, fpSize=1024)


def test_use_chirality_distinguishes_enantiomers():
    r = mol_from_smiles("C[C@H](N)C(=O)O")
    s = mol_from_smiles("C[C@@H](N)C(=O)O")
    plain = MorganFingerprintGenerator(radius=2, fpSize=1024)
    chiral = MorganFingerprintGenerator(radius=2, fpSize=1024, useChirality=True)
    # without chirality: identical fingerprints
    np.testing.assert_array_equal(plain.GetFingerprint(r), plain.GetFingerprint(s))
    # with chirality: different
    assert not np.array_equal(chiral.GetFingerprint(r), chiral.GetFingerprint(s))
    # accelerated paths agree with CPU for the chiral generator
    acc = chiral.GetFingerprints([r, s]).numpy()
    np.testing.assert_array_equal(acc, chiral.GetFingerprintsCpu([r, s]))
    fast = chiral.GetFingerprintsFromSmiles(
        ["C[C@H](N)C(=O)O", "C[C@@H](N)C(=O)O"]
    ).numpy()
    np.testing.assert_array_equal(fast, acc)


def test_morgan_chunked_dispatch(monkeypatch, mols100, smiles100):
    """Chunked kernel dispatch (large batches) is bit-identical."""
    import nvmolkit_tpu.fingerprints as F

    gen = F.MorganFingerprintGenerator(radius=2, fpSize=512)
    want = gen.GetFingerprints(mols100).numpy()
    monkeypatch.setattr(F, "_MORGAN_CHUNK", 7)  # force many tiny chunks
    got = gen.GetFingerprints(mols100).numpy()
    np.testing.assert_array_equal(got, want)
    got_fast = gen.GetFingerprintsFromSmiles(smiles100).numpy()
    np.testing.assert_array_equal(got_fast, want)


def test_fallback_rows_keep_input_order():
    """Oversized molecules drain to the CPU fallback; rows must still
    come back in input order (the chunk-concat + gather reassembly)."""
    from nvmolkit_tpu.chem import mol_from_smiles
    from nvmolkit_tpu.fingerprints import MorganFingerprintGenerator
    import numpy as np

    big = mol_from_smiles("C" * 300)         # beyond the largest bucket
    small = [mol_from_smiles(s) for s in ("CCO", "c1ccccc1", "CC(=O)O")]
    mols = [small[0], big, small[1], small[2]]
    gen = MorganFingerprintGenerator(radius=2, fpSize=1024)
    got = gen.GetFingerprints(mols).numpy()
    assert got.shape[0] == 4
    for i, m in enumerate(mols):
        if m.num_atoms <= 256:
            np.testing.assert_array_equal(got[i], gen.GetFingerprint(m), str(i))
    # the oversized row is nonzero and distinct from the small rows
    assert got[1].any()
    assert not np.array_equal(got[1], got[0])
