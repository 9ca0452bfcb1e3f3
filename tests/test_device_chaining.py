"""Device-resident pipeline chaining (round 3, VERDICT item 5).

The reference chains embed -> MMFF on-device via device-input overloads
(``src/conformer/ff_device_collect.h:64-97``, ``bfgs_mmff.h:69-103``).
Here every stage accepts a ``positionsFrom`` Dense3DResult; these tests
assert the chained results equal the host-conformer round-trip path.
"""
import numpy as np
import pytest

from nvmolkit_tpu.chem import mol_from_smiles
from nvmolkit_tpu.embedMolecules import EmbedMolecules
from nvmolkit_tpu.types import CoordinateOutput

SMILES = ["CCCCOC(=O)c1ccccc1", "CCCNC(=O)CC", "CCOCCN", "CC(C)CC(=O)NC"]


@pytest.fixture(scope="module")
def embedded():
    mols = [mol_from_smiles(s) for s in SMILES]
    dense = EmbedMolecules(mols, confsPerMolecule=4, maxIterations=8)
    assert all(len(m.conformers) >= 2 for m in mols)
    return mols, dense


def test_mmff_positions_from_matches_host_path(embedded):
    from nvmolkit_tpu.mmffOptimization import MMFFOptimizeMoleculesConfs

    mols, dense = embedded
    d_dev = MMFFOptimizeMoleculesConfs(
        mols, maxIters=30, positionsFrom=dense, output=CoordinateOutput.DEVICE
    )
    d_host = MMFFOptimizeMoleculesConfs(
        mols, maxIters=30, output=CoordinateOutput.DEVICE
    )
    # same systems minimized (host path slots are compacted, device path
    # keeps embed slots — compare per-molecule valid rows)
    ch = np.asarray(d_host.conf_mask)
    cd = np.asarray(d_dev.conf_mask)
    assert ch.sum() == cd.sum()
    ph, pd = np.asarray(d_host.positions), np.asarray(d_dev.positions)
    eh, ed = np.asarray(d_host.energies), np.asarray(d_dev.energies)
    for mi, m in enumerate(mols):
        hs, ds = np.nonzero(ch[mi])[0], np.nonzero(cd[mi])[0]
        assert len(hs) == len(ds) == len(m.conformers)
        na = m.num_atoms
        np.testing.assert_allclose(
            ph[mi, hs, :na], pd[mi, ds, :na], atol=1e-4
        )
        np.testing.assert_allclose(eh[mi, hs], ed[mi, ds], atol=1e-3)


def test_uff_positions_from_matches_host_path(embedded):
    from nvmolkit_tpu.uffOptimization import UFFOptimizeMoleculesConfs

    mols, dense = embedded
    d_dev = UFFOptimizeMoleculesConfs(
        mols, maxIters=30, positionsFrom=dense, output=CoordinateOutput.DEVICE
    )
    d_host = UFFOptimizeMoleculesConfs(
        mols, maxIters=30, output=CoordinateOutput.DEVICE
    )
    ch, cd = np.asarray(d_host.conf_mask), np.asarray(d_dev.conf_mask)
    ph, pd = np.asarray(d_host.positions), np.asarray(d_dev.positions)
    for mi, m in enumerate(mols):
        hs, ds = np.nonzero(ch[mi])[0], np.nonzero(cd[mi])[0]
        na = m.num_atoms
        np.testing.assert_allclose(
            ph[mi, hs, :na], pd[mi, ds, :na], atol=1e-4
        )


def test_rmsd_positions_from_matches_host_path(embedded):
    from nvmolkit_tpu.conformerRmsd import GetConformerRMSMatrixBatch

    mols, dense = embedded
    host = GetConformerRMSMatrixBatch(mols)
    dev = GetConformerRMSMatrixBatch(mols, positionsFrom=dense)
    for h, d in zip(host, dev):
        np.testing.assert_allclose(h.numpy(), d.numpy(), atol=1e-4)


def test_tfd_positions_from_matches_host_path(embedded):
    from nvmolkit_tpu.tfd import GetTFDMatrices

    mols, dense = embedded
    host = GetTFDMatrices(mols)
    dev = GetTFDMatrices(mols, positionsFrom=dense)
    for h, d in zip(host, dev):
        np.testing.assert_allclose(h.numpy(), d.numpy(), atol=1e-5)


def test_full_chain_embed_optimize_rmsd_butina(embedded):
    """embed -> MMFF -> RMSD -> butina with positions never leaving
    device memory (only final RMSD matrices and cluster labels come
    back to host)."""
    from nvmolkit_tpu.clustering import butina
    from nvmolkit_tpu.conformerRmsd import GetConformerRMSMatrixBatch
    from nvmolkit_tpu.mmffOptimization import MMFFOptimizeMoleculesConfs

    mols, dense = embedded
    minimized = MMFFOptimizeMoleculesConfs(
        mols, maxIters=20, positionsFrom=dense, output=CoordinateOutput.DEVICE
    )
    rms = GetConformerRMSMatrixBatch(mols, positionsFrom=minimized)
    for m, r in zip(mols, rms):
        n = len(m.conformers)
        v = r.numpy()
        assert v.shape == (n * (n - 1) // 2,)
        # expand condensed -> square for the butina API
        sq = np.zeros((n, n), np.float32)
        tri = np.tril_indices(n, k=-1)
        sq[tri] = v
        sq[tri[1], tri[0]] = v
        labels = np.asarray(butina(sq, 1.0).numpy())
        assert labels.shape == (n,)
        assert labels.min() >= 0


def test_positions_from_wrong_mol_count_raises(embedded):
    from nvmolkit_tpu.mmffOptimization import MMFFOptimizeMoleculesConfs

    mols, dense = embedded
    with pytest.raises(ValueError):
        MMFFOptimizeMoleculesConfs(mols[:2], positionsFrom=dense)


def test_batched_ff_minimize_device_output_chain(embedded):
    """BatchedForcefield.minimize(output=DEVICE, positionsFrom=...)
    returns a device-resident Dense3DResult that chains into RMSD/TFD
    without a host round-trip, and equals the default-output path
    (VERDICT r4 item 4)."""
    from nvmolkit_tpu.batchedForcefield import UFFBatchedForcefield
    from nvmolkit_tpu.conformerRmsd import GetConformerRMSMatrixBatch
    from nvmolkit_tpu.tfd import GetTFDMatrices
    from nvmolkit_tpu.types import Dense3DResult

    mols, dense = embedded
    ff = UFFBatchedForcefield(mols)
    res = ff.minimize(maxIters=30, positionsFrom=dense,
                      output=CoordinateOutput.DEVICE)
    assert isinstance(res, Dense3DResult)
    n_mols = len(mols)
    max_confs = max(len(m.conformers) for m in mols)
    assert res.positions.shape[:2] == (n_mols, max_confs)
    assert res.energies is not None and res.converged is not None

    # default-output path on a fresh wrapper must agree
    ff2 = UFFBatchedForcefield(mols)
    e2, conv2 = ff2.minimize(maxIters=30, positionsFrom=dense)
    cm = np.asarray(res.conf_mask)
    e_dense = np.asarray(res.energies)[cm]
    np.testing.assert_allclose(e_dense, e2.numpy(), rtol=1e-5, atol=1e-5)

    # chain into RMSD + TFD device-side
    rms = GetConformerRMSMatrixBatch(mols, positionsFrom=res)
    tfd = GetTFDMatrices(mols, positionsFrom=res)
    for m, r, t in zip(mols, rms, tfd):
        n = len(m.conformers)
        assert r.numpy().shape == (n * (n - 1) // 2,)
        assert t.numpy().shape == (n * (n - 1) // 2,)


def test_batched_ff_minimize_target_gpu_validation(embedded):
    from nvmolkit_tpu.batchedForcefield import UFFBatchedForcefield

    mols, _ = embedded
    ff = UFFBatchedForcefield(mols)
    with pytest.raises(ValueError, match="target_gpu"):
        ff.minimize(maxIters=1, target_gpu=999)


def test_batched_ff_positions_from_count_mismatch(embedded):
    from nvmolkit_tpu.batchedForcefield import UFFBatchedForcefield

    mols, dense = embedded
    ff = UFFBatchedForcefield(mols[:2])
    with pytest.raises(ValueError, match="positionsFrom"):
        ff.minimize(maxIters=1, positionsFrom=dense)
