"""E/Z double-bond stereo tests (reference: double-bond stereo check
stage + findDoubleBonds role)."""
import math

import numpy as np
import pytest

from nvmolkit_tpu.chem import mol_from_smiles
from nvmolkit_tpu.chem.stereo import find_stereo_double_bonds
from nvmolkit_tpu.embedMolecules import EmbedMolecules


def _dihedral(p, i, j, k, l):
    b1, b2, b3 = p[j] - p[i], p[k] - p[j], p[l] - p[k]
    n1, n2 = np.cross(b1, b2), np.cross(b2, b3)
    m1 = np.cross(n1, b2 / np.linalg.norm(b2))
    return math.degrees(math.atan2(np.dot(m1, n2), np.dot(n1, n2)))


def test_perception_trans():
    m = mol_from_smiles("F/C=C/F")
    sdbs = find_stereo_double_bonds(m)
    assert len(sdbs) == 1
    assert not sdbs[0].is_cis


def test_perception_cis():
    m = mol_from_smiles("F/C=C\\F")
    sdbs = find_stereo_double_bonds(m)
    assert len(sdbs) == 1
    assert sdbs[0].is_cis


def test_perception_none_without_markers():
    m = mol_from_smiles("FC=CF")
    assert find_stereo_double_bonds(m) == []
    # ring double bonds excluded
    m = mol_from_smiles("C1=CCCCC1")
    assert find_stereo_double_bonds(m) == []


@pytest.mark.parametrize("smiles,want_cis", [("F/C=C/F", False), ("F/C=C\\F", True)])
def test_embedding_respects_ez(smiles, want_cis):
    m = mol_from_smiles(smiles)
    res = EmbedMolecules([m], confsPerMolecule=3, maxIterations=20)
    cm = np.asarray(res.conf_mask)
    assert cm.sum() >= 1
    sdb = find_stereo_double_bonds(m)[0]
    for conf in m.conformers:
        phi = _dihedral(conf, sdb.i, sdb.j, sdb.k, sdb.l)
        if want_cis:
            assert abs(phi) < 60.0, f"expected cis, got dihedral {phi}"
        else:
            assert abs(phi) > 120.0, f"expected trans, got dihedral {phi}"
