"""Kekulé-form aromaticity perception tests (RDKit-sanitization role)."""
import numpy as np
import pytest

from nvmolkit_tpu.chem import BondType, mol_from_smiles
from nvmolkit_tpu.fingerprints import MorganFingerprintGenerator


def _fp(m):
    return MorganFingerprintGenerator(radius=2, fpSize=1024).GetFingerprint(m)


@pytest.mark.parametrize("kekule,aromatic", [
    ("C1=CC=CC=C1", "c1ccccc1"),                      # benzene
    ("C1=CC=NC=C1", "c1ccncc1"),                      # pyridine
    ("C1=CC=CN1", "c1cc[nH]c1"),                      # pyrrole
    ("C1=CC=CO1", "c1ccoc1"),                         # furan
    ("C1=CC2=CC=CC=C2C=C1", "c1ccc2ccccc2c1"),        # naphthalene
])
def test_kekule_equals_aromatic_form(kekule, aromatic):
    mk = mol_from_smiles(kekule)
    ma = mol_from_smiles(aromatic)
    assert all(a.is_aromatic for a in mk.atoms), kekule
    # atom order differs between the two SMILES; compare order-invariantly
    assert sorted(a.total_hs for a in mk.atoms) == sorted(
        a.total_hs for a in ma.atoms
    )
    np.testing.assert_array_equal(_fp(mk), _fp(ma))


@pytest.mark.parametrize("smiles", [
    "C1CCCCC1",          # cyclohexane
    "C1=CCCCC1",         # cyclohexene
    "O=C1C=CC(=O)C=C1",  # quinone
    "C1=CC=CC=CC=C1",    # cyclooctatetraene (8 pi)
    "C1=CC1",            # cyclopropene
])
def test_not_aromatic(smiles):
    m = mol_from_smiles(smiles)
    assert not any(a.is_aromatic for a in m.atoms), smiles


def test_pyrrole_nh_preserved():
    m = mol_from_smiles("C1=CC=CN1")
    n = next(a for a in m.atoms if a.atomic_num == 7)
    assert n.is_aromatic
    assert n.total_hs == 1  # Kekulé N-H survives aromatization


def test_native_parser_perceives_kekule():
    from nvmolkit_tpu.chem.native import mols_from_smiles_native, native_available

    if not native_available():
        pytest.skip("native unavailable")
    smis = ["C1=CC=CC=C1", "C1=CC=CN1", "C1=CC2=CC=CC=C2C=C1", "O=C1C=CC(=O)C=C1"]
    native = mols_from_smiles_native(smis)
    for smi, nat in zip(smis, native):
        py = mol_from_smiles(smi)
        assert [a.is_aromatic for a in nat.atoms] == [a.is_aromatic for a in py.atoms], smi
        assert [a.total_hs for a in nat.atoms] == [a.total_hs for a in py.atoms], smi
        assert [int(b.bond_type) for b in nat.bonds] == [
            int(b.bond_type) for b in py.bonds
        ], smi


class TestExocyclicCarbonylRule:
    """RDKit's default-model rule: an exocyclic double bond to an
    electronegative atom contributes 0 pi electrons without
    disqualifying the ring (how 2-pyridone is aromatic); exocyclic C=C
    (fulvene) still disqualifies; quinone (two carbonyls + 4 pi) stays
    non-aromatic."""

    @pytest.mark.parametrize("kekule,aromatic_form", [
        ("O=C1C=CC=CN1", "O=c1cccc[nH]1"),        # 2-pyridone
        ("O=C1C=CN(C)C=C1", None),                 # N-methyl-4-pyridone
        ("O=C1NC(=O)NC=C1", None),                 # uracil
    ])
    def test_carbonyl_ring_aromatic(self, kekule, aromatic_form):
        m = mol_from_smiles(kekule)
        ring_aromatic = [a.is_aromatic for a in m.atoms if a.in_ring]
        assert all(ring_aromatic) and len(ring_aromatic) == 6, kekule
        # exocyclic O stays non-aromatic
        assert not any(
            a.is_aromatic for a in m.atoms if not a.in_ring
        ), kekule
        if aromatic_form:
            ma = mol_from_smiles(aromatic_form)
            np.testing.assert_array_equal(_fp(m), _fp(ma))

    @pytest.mark.parametrize("smiles", [
        "O=C1C=CC(=O)C=C1",   # p-quinone: 4 pi
        "C=C1C=CC=C1",        # fulvene: exocyclic C=C
        "O=C1CCCCC1",         # cyclohexanone: saturated
    ])
    def test_still_not_aromatic(self, smiles):
        m = mol_from_smiles(smiles)
        assert not any(a.is_aromatic for a in m.atoms), smiles

    def test_native_parser_agrees(self):
        from nvmolkit_tpu.chem.native import (
            mols_from_smiles_native,
            native_available,
        )

        if not native_available():
            pytest.skip("native unavailable")
        smis = ["O=C1C=CC=CN1", "O=C1C=CC(=O)C=C1", "C=C1C=CC=C1",
                "O=C1NC(=O)NC=C1"]
        for smi, nat in zip(smis, mols_from_smiles_native(smis)):
            py = mol_from_smiles(smi)
            assert [a.is_aromatic for a in nat.atoms] == [
                a.is_aromatic for a in py.atoms
            ], smi
