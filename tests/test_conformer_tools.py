"""Conformer RMSD + TFD tests (reference: ``test_conformer_rmsd.py``,
``test_tfd.py`` roles; oracles are geometric identities)."""
import math

import numpy as np
import pytest

from nvmolkit_tpu.chem import mol_from_smiles
from nvmolkit_tpu.conformerRmsd import GetConformerRMSMatrix, GetConformerRMSMatrixBatch
from nvmolkit_tpu.tfd import GetTFDMatrix, GetTFDMatrices


def _rot(theta):
    c, s = math.cos(theta), math.sin(theta)
    return np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]])


@pytest.fixture()
def butane_confs(rng):
    m = mol_from_smiles("CCCC")
    base = np.array(
        [[0, 0, 0], [1.53, 0, 0], [2.04, 1.44, 0], [3.57, 1.44, 0.0]], float
    )
    m.add_conformer(base)
    # rotated+translated copy: RMSD must be ~0 after Kabsch
    m.add_conformer(base @ _rot(0.8).T + np.array([5.0, -3.0, 2.0]))
    # genuinely different: twist the last atom out of plane
    twisted = base.copy()
    twisted[3] = [3.0, 1.44, 1.2]
    m.add_conformer(twisted)
    return m


def test_rmsd_identity_under_rigid_motion(butane_confs):
    rms = GetConformerRMSMatrix(butane_confs).numpy()
    # condensed (i,j): (1,0), (2,0), (2,1)
    assert rms.shape == (3,)
    assert rms[0] < 1e-3          # rotated copy aligns exactly
    assert rms[1] > 0.1           # twisted differs
    assert abs(rms[1] - rms[2]) < 1e-3  # conf1 == conf0 up to rigid motion


def test_rmsd_prealigned_differs(butane_confs):
    aligned = GetConformerRMSMatrix(butane_confs, prealigned=False).numpy()
    plain = GetConformerRMSMatrix(butane_confs, prealigned=True).numpy()
    assert plain[0] > aligned[0] + 1.0  # translation not removed


def test_rmsd_batch_matches_single(butane_confs, rng):
    m2 = mol_from_smiles("CCO")
    c = rng.random((3, 3))
    m2.add_conformer(c)
    m2.add_conformer(c + rng.random(3) * 0.1)
    batch = GetConformerRMSMatrixBatch([butane_confs, m2])
    single0 = GetConformerRMSMatrix(butane_confs).numpy()
    single1 = GetConformerRMSMatrix(m2).numpy()
    np.testing.assert_allclose(batch[0].numpy(), single0, atol=1e-5)
    np.testing.assert_allclose(batch[1].numpy(), single1, atol=1e-5)


def test_rmsd_heavy_atoms_only():
    m = mol_from_smiles("CC")
    a = np.array([[0, 0, 0], [1.5, 0, 0]], float)
    m.add_conformer(a)
    m.add_conformer(a + 1.0)
    rms = GetConformerRMSMatrix(m, heavyAtomsOnly=True).numpy()
    assert rms[0] < 1e-3  # rigid translation


def test_rmsd_requires_two_conformers():
    m = mol_from_smiles("CC")
    m.add_conformer(np.zeros((2, 3)))
    with pytest.raises(ValueError):
        GetConformerRMSMatrix(m)


def _butane_with_dihedrals(phis):
    """Butane conformers with specified C-C-C-C dihedral angles."""
    m = mol_from_smiles("CCCC")
    r, theta = 1.53, math.radians(112)
    for phi_deg in phis:
        phi = math.radians(phi_deg)
        p0 = np.array([r * math.cos(theta), r * math.sin(theta), 0.0])
        p1 = np.array([0.0, 0.0, 0.0])
        p2 = np.array([r, 0.0, 0.0])
        p3 = p2 + np.array(
            [
                -r * math.cos(theta),
                r * math.sin(theta) * math.cos(phi),
                r * math.sin(theta) * math.sin(phi),
            ]
        ) * -1.0 + np.array([r * math.cos(theta) * 0, 0, 0])
        # simpler: place p3 by rotating around the p1-p2 axis
        axis = np.array([1.0, 0, 0])
        v = np.array([math.cos(math.pi - theta), math.sin(math.pi - theta), 0.0]) * r
        c, s = math.cos(phi), math.sin(phi)
        rot = np.array([[1, 0, 0], [0, c, -s], [0, s, c]])
        p3 = p2 + rot @ v
        m.add_conformer(np.stack([p0, p1, p2, p3]))
    return m


def test_tfd_dihedral_sensitivity():
    m = _butane_with_dihedrals([60.0, 60.0, 180.0])
    tfd = GetTFDMatrix(m, useWeights=False).numpy()
    # (1,0): same dihedral -> 0; (2,0)/(2,1): 120 deg / 180 maxdev = 2/3
    assert tfd[0] < 1e-4
    assert tfd[1] == pytest.approx(120.0 / 180.0, abs=1e-3)
    assert tfd[2] == pytest.approx(120.0 / 180.0, abs=1e-3)


def test_tfd_circular_wrap():
    m = _butane_with_dihedrals([179.0, -179.0])
    tfd = GetTFDMatrix(m, useWeights=False).numpy()
    assert tfd[0] == pytest.approx(2.0 / 180.0, abs=1e-3)  # wraps to 2 deg


def test_tfd_no_torsions_is_zero():
    m = mol_from_smiles("CO")  # no torsion (both termini degree 1... C has O only)
    m.add_conformer(np.array([[0, 0, 0], [1.4, 0, 0.0]]))
    m.add_conformer(np.array([[0, 0, 0], [0, 1.4, 0.0]]))
    tfd = GetTFDMatrix(m).numpy()
    assert tfd.shape == (1,)
    assert tfd[0] == 0.0


def test_tfd_batch(butane_confs):
    res = GetTFDMatrices([butane_confs, butane_confs])
    a, b = res[0].numpy(), res[1].numpy()
    np.testing.assert_allclose(a, b)
    assert a.shape == (3,)


def test_tfd_bad_maxdev():
    m = _butane_with_dihedrals([0.0, 10.0])
    with pytest.raises(ValueError):
        GetTFDMatrices([m], maxDev="nope")
