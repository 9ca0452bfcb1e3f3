"""Cross-cutting invariance properties.

The reference validates most kernels differentially against RDKit
(SURVEY.md §4.1); without RDKit in this image, these tests pin the
*mathematical* invariants each kernel must satisfy regardless of oracle:
graph-isomorphism invariance of fingerprints, rigid-motion invariance of
RMSD/TFD, cluster-membership validity of Butina, and descent of the
minimizers. A wrong perception rule can't hide in a self-consistent
oracle here — these properties are oracle-free.
"""
import numpy as np
import pytest

from nvmolkit_tpu.chem import mol_from_smiles

# pairs of SMILES writing the SAME molecule with different atom orders
ISOMORPH_PAIRS = [
    ("CCO", "OCC"),
    ("Cc1ccccc1", "c1ccc(C)cc1"),
    ("CC(=O)O", "OC(C)=O"),
    ("c1ccncc1", "c1cnccc1"),
    ("CC(N)C(=O)O", "OC(=O)C(C)N"),
    ("FC(F)(F)c1ccccc1", "c1ccccc1C(F)(F)F"),
]


class TestMorganGraphInvariance:
    """Fingerprints are functions of the molecular graph, not of the
    atom numbering the SMILES happened to induce (the reference's
    bit-parity tests get this for free from RDKit canonicalization)."""

    @pytest.mark.parametrize("a,b", ISOMORPH_PAIRS)
    def test_same_molecule_same_bits(self, a, b):
        from nvmolkit_tpu.fingerprints import MorganFingerprintGenerator

        gen = MorganFingerprintGenerator(radius=3, fpSize=2048)
        fa = gen.GetFingerprints([mol_from_smiles(a)]).numpy()
        fb = gen.GetFingerprints([mol_from_smiles(b)]).numpy()
        np.testing.assert_array_equal(fa, fb)

    def test_different_molecules_different_bits(self):
        from nvmolkit_tpu.fingerprints import MorganFingerprintGenerator

        gen = MorganFingerprintGenerator(radius=3, fpSize=2048)
        fps = gen.GetFingerprints(
            [mol_from_smiles(s) for s in ("CCO", "CCN", "CCC")]
        ).numpy()
        assert not np.array_equal(fps[0], fps[1])
        assert not np.array_equal(fps[0], fps[2])


class TestSubstructGraphInvariance:
    @pytest.mark.parametrize("a,b", ISOMORPH_PAIRS)
    def test_match_counts_equal(self, a, b):
        from nvmolkit_tpu.substructure import countSubstructMatches

        queries = ["[OX2H1]", "c1ccccc1", "[CX3](=O)", "[NX3]", "C"]
        ca = countSubstructMatches([mol_from_smiles(a)], queries)
        cb = countSubstructMatches([mol_from_smiles(b)], queries)
        np.testing.assert_array_equal(ca, cb)


class TestRigidMotionInvariance:
    @pytest.fixture()
    def embedded(self):
        from nvmolkit_tpu.embedMolecules import EmbedMolecules

        from nvmolkit_tpu.embedMolecules import EmbedParameters

        mols = [mol_from_smiles(s) for s in ("CCCCO", "CC(C)CC(=O)O")]
        EmbedMolecules(mols, EmbedParameters(randomSeed=7),
                       confsPerMolecule=3, maxIterations=10)
        assert all(len(m.conformers) >= 2 for m in mols)
        return mols

    @staticmethod
    def _rigidly_move(conf, rng):
        # random proper rotation (QR with det fixup) + translation
        q, _ = np.linalg.qr(rng.standard_normal((3, 3)))
        if np.linalg.det(q) < 0:
            q[:, 0] *= -1
        return (conf @ q.astype(np.float32)) + rng.standard_normal(3).astype(
            np.float32
        )

    def test_rmsd_matrix_invariant(self, embedded):
        from nvmolkit_tpu.conformerRmsd import GetConformerRMSMatrix

        rng = np.random.default_rng(0)
        base = [GetConformerRMSMatrix(m).numpy() for m in embedded]
        for m in embedded:
            m.conformers = [self._rigidly_move(c, rng) for c in m.conformers]
        moved = [GetConformerRMSMatrix(m).numpy() for m in embedded]
        for b, v in zip(base, moved):
            np.testing.assert_allclose(b, v, atol=2e-3)

    def test_tfd_matrix_invariant(self, embedded):
        from nvmolkit_tpu.tfd import GetTFDMatrices

        rng = np.random.default_rng(1)
        base = [t.numpy() for t in GetTFDMatrices(embedded)]
        for m in embedded:
            m.conformers = [self._rigidly_move(c, rng) for c in m.conformers]
        moved = [t.numpy() for t in GetTFDMatrices(embedded)]
        for b, v in zip(base, moved):
            np.testing.assert_allclose(b, v, atol=2e-3)

    def test_mmff_energy_invariant(self, embedded):
        from nvmolkit_tpu.batchedForcefield import MMFFBatchedForcefield

        rng = np.random.default_rng(2)
        e0 = np.asarray(MMFFBatchedForcefield(embedded).compute_energy().numpy())
        for m in embedded:
            m.conformers = [self._rigidly_move(c, rng) for c in m.conformers]
        e1 = np.asarray(MMFFBatchedForcefield(embedded).compute_energy().numpy())
        np.testing.assert_allclose(e0, e1, rtol=2e-3, atol=2e-3)


class TestButinaValidity:
    def test_members_within_cutoff_of_centroid(self):
        from nvmolkit_tpu.clustering import butina
        from nvmolkit_tpu.ops.packed_bits import pack_bits_np
        from nvmolkit_tpu.ops.similarity import cross_similarity

        import jax.numpy as jnp

        rng = np.random.default_rng(3)
        centers = rng.random((40, 512)) < 0.12
        rows = centers[rng.integers(0, 40, 600)]
        rows ^= rng.random(rows.shape) < 0.02
        fps = pack_bits_np(rows.astype(np.uint8))
        cutoff = 0.35
        sim = np.asarray(
            cross_similarity(jnp.asarray(fps), jnp.asarray(fps), metric="tanimoto")
        )
        ids_async, centroids = butina(
            jnp.asarray(1.0 - sim), cutoff=cutoff, return_centroids=True
        )
        ids = np.asarray(ids_async.numpy())
        assert ids.min() == 0  # partition: every item assigned
        n_clusters = ids.max() + 1
        assert len(centroids) == n_clusters
        for c in range(n_clusters):
            members = np.nonzero(ids == c)[0]
            # Butina membership: within cutoff distance of the centroid
            assert np.all(1.0 - sim[centroids[c], members] <= cutoff + 1e-6)
        # cluster ids are ordered by non-increasing size
        sizes = np.bincount(ids, minlength=n_clusters)
        assert np.all(sizes[:-1] >= sizes[1:])


class TestMinimizerDescent:
    def test_minimize_never_increases_energy(self):
        from nvmolkit_tpu.embedMolecules import EmbedMolecules
        from nvmolkit_tpu.batchedForcefield import MMFFBatchedForcefield
        from nvmolkit_tpu.mmffOptimization import MMFFOptimizeMoleculesConfs

        from nvmolkit_tpu.embedMolecules import EmbedParameters

        mols = [mol_from_smiles(s) for s in ("CCCC(=O)N", "c1ccccc1CCO")]
        EmbedMolecules(mols, EmbedParameters(randomSeed=11),
                       confsPerMolecule=2, maxIterations=10)
        assert all(m.conformers for m in mols)
        e_before = np.asarray(MMFFBatchedForcefield(mols).compute_energy().numpy())
        results, dense = MMFFOptimizeMoleculesConfs(mols, maxIters=150)
        mask = np.asarray(dense.conf_mask)
        e_after = np.asarray(dense.energies)[mask]
        assert e_after.shape == e_before.shape
        assert np.all(e_after <= e_before + 1e-3)


class TestCoordinateOutput:
    def test_default_writes_back_minimized_coords(self):
        from nvmolkit_tpu.embedMolecules import EmbedMolecules, EmbedParameters
        from nvmolkit_tpu.uffOptimization import UFFOptimizeMoleculesConfs
        from nvmolkit_tpu.types import CoordinateOutput, Dense3DResult

        mols = [mol_from_smiles("CCCCO")]
        EmbedMolecules(mols, EmbedParameters(randomSeed=3), confsPerMolecule=2,
                       maxIterations=10)
        before = [c.copy() for c in mols[0].conformers]
        results, dense = UFFOptimizeMoleculesConfs(mols, maxIters=80)
        pos = np.asarray(dense.positions)
        na = mols[0].num_atoms
        for ci, conf in enumerate(mols[0].conformers):
            np.testing.assert_array_equal(conf, pos[0, ci, :na])
            assert not np.array_equal(conf, before[ci])  # actually moved

        # DEVICE: no writeback, dense-only return
        held = [c.copy() for c in mols[0].conformers]
        out = UFFOptimizeMoleculesConfs(
            mols, maxIters=80, output=CoordinateOutput.DEVICE
        )
        assert isinstance(out, Dense3DResult)
        for ci, conf in enumerate(mols[0].conformers):
            np.testing.assert_array_equal(conf, held[ci])

    def test_enum_alias(self):
        from nvmolkit_tpu.types import CoordinateOutput

        assert CoordinateOutput.RDKIT_CONFORMERS is CoordinateOutput.CONFORMERS
