"""Public UFF optimization API tests (mirrors reference
``test_uff_optimization.py`` / ``test_batched_forcefield.py`` roles)."""
import math

import numpy as np
import pytest

from nvmolkit_tpu.batchedForcefield import UFFBatchedForcefield
from nvmolkit_tpu.chem import mol_from_smiles
from nvmolkit_tpu.uffOptimization import UFFOptimizeMoleculesConfs


def _lattice_conformer(m, rng, spacing=1.6):
    n = m.num_atoms
    side = math.ceil(n ** (1 / 3))
    grid = np.array(
        [(x, y, z) for x in range(side) for y in range(side) for z in range(side)],
        dtype=np.float64,
    )[:n]
    return grid * spacing + (rng.random((n, 3)) - 0.5) * 0.4


@pytest.fixture()
def mols_with_confs(rng):
    mols = [mol_from_smiles(s) for s in ["CCO", "CCCC", "c1ccccc1", "CC(=O)O"]]
    for m in mols:
        m.add_conformer(_lattice_conformer(m, rng))
        m.add_conformer(_lattice_conformer(m, rng))  # two conformers each
    return mols


def test_optimize_molecules_confs(mols_with_confs):
    results, dense = UFFOptimizeMoleculesConfs(mols_with_confs, maxIters=400)
    assert len(results) == 4
    statuses = [s for mol_results in results for s, _ in mol_results]
    energies = [e for mol_results in results for _, e in mol_results]
    assert len(statuses) == 8
    # f32 BFGS trajectories are chaotic; demand most systems converge and
    # all relax to low strain
    assert sum(1 for s in statuses if s == 0) >= 6
    assert all(e < 100.0 for e in energies)
    # dense result shape/masks
    assert dense.positions.shape[0] == 4
    per_mol = dense.per_molecule()
    assert len(per_mol) == 4
    assert per_mol[0][0].shape == (mols_with_confs[0].num_atoms, 3)


def test_optimize_requires_conformers():
    m = mol_from_smiles("CCO")
    with pytest.raises(ValueError, match="no conformers"):
        UFFOptimizeMoleculesConfs([m])


def test_batched_forcefield_energy_grad_minimize(mols_with_confs):
    ff = UFFBatchedForcefield(mols_with_confs)
    e0 = ff.compute_energy().numpy()
    g0 = ff.compute_gradients().numpy()
    assert e0.shape == (8,)
    assert g0.shape == (8, ff.max_atoms, 3)
    assert np.isfinite(e0).all() and np.isfinite(g0).all()

    energies, converged = ff.minimize(maxIters=400)
    e1 = energies.numpy()
    assert (e1 <= e0 + 1e-3).all()
    assert converged.numpy().sum() >= 6
    # energies relax by orders of magnitude from the strained start
    assert (e1 < 0.05 * e0 + 50.0).all()


def test_batched_forcefield_set_positions(mols_with_confs):
    ff = UFFBatchedForcefield(mols_with_confs)
    pos = np.asarray(ff.positions)
    ff.set_positions(pos + 0.01)
    with pytest.raises(ValueError):
        ff.set_positions(pos[:2])


def test_optimize_chunked_matches_unchunked():
    """batchSize chunking must not change minimization results (no RNG
    in the minimize path; chunk boundaries only split launches)."""
    import numpy as np

    from nvmolkit_tpu.chem import mol_from_smiles
    from nvmolkit_tpu.uffOptimization import UFFOptimizeMoleculesConfs
    from nvmolkit_tpu.utils.config import HardwareOptions

    def build():
        rng = np.random.default_rng(42)
        mols = []
        for s in ["CCO", "CCN", "CCCC", "c1ccccc1", "CC(C)O", "CCOC"]:
            m = mol_from_smiles(s)
            n = m.num_atoms
            # zig-zag chain with ~bond-length spacing: well-conditioned
            # start (random overlaps make the trajectory chaotic and
            # sensitive to batch-shape f32 rounding)
            base = np.stack(
                [np.arange(n) * 1.5, (np.arange(n) % 2) * 0.8, np.zeros(n)],
                axis=1,
            ) + rng.random((n, 3)) * 0.05
            m.add_conformer(base)
            m.add_conformer(base + 0.01)
            mols.append(m)
        return mols

    r_full, d_full = UFFOptimizeMoleculesConfs(build(), maxIters=150)
    r_chunk, d_chunk = UFFOptimizeMoleculesConfs(
        build(), maxIters=150, hardwareOptions=HardwareOptions(batchSize=3)
    )
    e_full = np.asarray(d_full.energies)
    e_chunk = np.asarray(d_chunk.energies)
    np.testing.assert_allclose(e_chunk, e_full, rtol=1e-4, atol=1e-4)
    np.testing.assert_array_equal(
        np.asarray(d_full.converged), np.asarray(d_chunk.converged)
    )


class TestPerMoleculeSequences:
    """Reference parity: vdwThreshold / ignoreInterfragInteractions may
    be per-molecule sequences (``nvmolkit/uffOptimization.py:35-36``,
    ``mmffOptimization.py:42-43``)."""

    @staticmethod
    def _two_fragment_mols(rng=None):
        # fixed local seed: every call must hand out the SAME starting
        # geometry so sequence runs compare against scalar runs exactly
        local = np.random.default_rng(0xF7A6)
        mols = [mol_from_smiles("CO.OC"), mol_from_smiles("CO.OC")]
        conf = _lattice_conformer(mols[0], local, spacing=1.5)
        for m in mols:
            m.add_conformer(conf.copy())
        return mols

    def test_uff_interfrag_sequence_matches_scalar_runs(self, rng):
        # few iterations: at full convergence the fragments separate and
        # the interfrag vdW term decays to ~0, masking the flag
        mols = self._two_fragment_mols(rng)
        res_seq, _ = UFFOptimizeMoleculesConfs(
            mols, maxIters=4, ignoreInterfragInteractions=[True, False]
        )
        m_t = self._two_fragment_mols(rng)[:1]
        res_t, _ = UFFOptimizeMoleculesConfs(
            m_t, maxIters=4, ignoreInterfragInteractions=True
        )
        m_f = self._two_fragment_mols(rng)[:1]
        res_f, _ = UFFOptimizeMoleculesConfs(
            m_f, maxIters=4, ignoreInterfragInteractions=False
        )
        np.testing.assert_allclose(res_seq[0][0][1], res_t[0][0][1], rtol=1e-5)
        np.testing.assert_allclose(res_seq[1][0][1], res_f[0][0][1], rtol=1e-5)
        # the flag must actually change the answer for this geometry
        assert not np.isclose(res_seq[0][0][1], res_seq[1][0][1], rtol=1e-3)

    def test_mmff_interfrag_sequence_matches_scalar_runs(self, rng):
        from nvmolkit_tpu.mmffOptimization import MMFFOptimizeMoleculesConfs

        mols = self._two_fragment_mols(rng)
        res_seq, _ = MMFFOptimizeMoleculesConfs(
            mols, maxIters=30, ignoreInterfragInteractions=[True, False]
        )
        m_t = self._two_fragment_mols(rng)[:1]
        res_t, _ = MMFFOptimizeMoleculesConfs(
            m_t, maxIters=30, ignoreInterfragInteractions=True
        )
        m_f = self._two_fragment_mols(rng)[:1]
        res_f, _ = MMFFOptimizeMoleculesConfs(
            m_f, maxIters=30, ignoreInterfragInteractions=False
        )
        np.testing.assert_allclose(res_seq[0][0][1], res_t[0][0][1], rtol=1e-5)
        np.testing.assert_allclose(res_seq[1][0][1], res_f[0][0][1], rtol=1e-5)
        assert not np.isclose(res_seq[0][0][1], res_seq[1][0][1], rtol=1e-3)

    def test_sequence_length_validation(self, rng):
        mols = self._two_fragment_mols(rng)
        with pytest.raises(ValueError, match="vdwThreshold sequence length"):
            UFFOptimizeMoleculesConfs(mols, vdwThreshold=[10.0])
        from nvmolkit_tpu.mmffOptimization import MMFFOptimizeMoleculesConfs

        with pytest.raises(ValueError, match="nonBondedThreshold sequence"):
            MMFFOptimizeMoleculesConfs(mols, nonBondedThreshold=[100.0])
