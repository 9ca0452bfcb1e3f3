"""Tests for the cheminformatics core (SMILES parsing, rings, implicit Hs)."""
import numpy as np
import pytest

from nvmolkit_tpu.chem import BondType, Mol, mol_from_smiles
from nvmolkit_tpu.chem.mol import Atom


def test_ethanol():
    m = mol_from_smiles("CCO")
    assert m.num_atoms == 3
    assert m.num_bonds == 2
    assert [a.atomic_num for a in m.atoms] == [6, 6, 8]
    assert [a.total_hs for a in m.atoms] == [3, 2, 1]
    assert not any(a.in_ring for a in m.atoms)


def test_benzene_aromatic():
    m = mol_from_smiles("c1ccccc1")
    assert m.num_atoms == 6
    assert m.num_bonds == 6
    assert all(a.is_aromatic for a in m.atoms)
    assert all(a.in_ring for a in m.atoms)
    assert all(b.bond_type == BondType.AROMATIC for b in m.bonds)
    assert all(a.total_hs == 1 for a in m.atoms)
    assert all(a.min_ring_size == 6 for a in m.atoms)


def test_pyridine_hs():
    m = mol_from_smiles("c1ccncc1")
    n = next(a for a in m.atoms if a.atomic_num == 7)
    assert n.total_hs == 0
    assert n.is_aromatic


def test_pyrrole_bracket_nh():
    m = mol_from_smiles("c1cc[nH]c1")
    n = next(a for a in m.atoms if a.atomic_num == 7)
    assert n.total_hs == 1
    assert n.is_aromatic
    assert all(b.bond_type == BondType.AROMATIC for b in m.bonds)


def test_biphenyl_link_is_single():
    m = mol_from_smiles("c1ccc(cc1)c1ccccc1")
    link = [b for b in m.bonds if not b.in_ring]
    assert len(link) == 1
    assert link[0].bond_type == BondType.SINGLE


def test_charges_and_isotopes():
    m = mol_from_smiles("[13CH4]")
    assert m.atoms[0].isotope == 13
    assert m.atoms[0].total_hs == 4
    m = mol_from_smiles("[NH4+]")
    assert m.atoms[0].formal_charge == 1
    assert m.atoms[0].total_hs == 4
    m = mol_from_smiles("CC(=O)[O-]")
    assert m.atoms[-1].formal_charge == -1
    m = mol_from_smiles("[Fe+2]")
    assert m.atoms[0].formal_charge == 2


def test_ring_closure_percent():
    m = mol_from_smiles("C%10CCCCC%10")
    assert m.num_bonds == 6
    assert all(a.in_ring for a in m.atoms)


def test_fused_rings_smallest_size():
    m = mol_from_smiles("c1ccc2ccccc2c1")  # naphthalene
    assert m.num_atoms == 10
    assert m.num_bonds == 11
    assert all(a.min_ring_size == 6 for a in m.atoms)


def test_spiro_and_bridged():
    m = mol_from_smiles("C1CC2CCC1CC2")  # bicyclo[2.2.2]octane
    assert all(a.in_ring for a in m.atoms)


def test_dot_fragments():
    m = mol_from_smiles("[Na+].[Cl-]")
    assert m.num_atoms == 2
    assert m.num_bonds == 0


def test_explicit_bonds():
    m = mol_from_smiles("C=C")
    assert m.bonds[0].bond_type == BondType.DOUBLE
    m = mol_from_smiles("C#N")
    assert m.bonds[0].bond_type == BondType.TRIPLE
    assert m.atoms[0].total_hs == 1
    assert m.atoms[1].total_hs == 0


def test_branching():
    m = mol_from_smiles("CC(C)(C)C")  # neopentane
    assert m.degree(1) == 4
    assert m.atoms[1].total_hs == 0


def test_sulfur_hypervalent():
    m = mol_from_smiles("O=S(=O)(O)O")  # sulfuric acid
    s = next(a for a in m.atoms if a.atomic_num == 16)
    assert s.total_hs == 0


def test_all_100_parse(mols100):
    assert len(mols100) == 100
    for m in mols100:
        assert m.num_atoms > 0
        arrays = m.to_arrays()
        assert arrays["atomic_num"].shape == (m.num_atoms,)
        assert arrays["adj_bonds"].shape == (m.num_atoms, 8)
        # degrees consistent between graph and flat export
        np.testing.assert_array_equal(
            arrays["degree"], (arrays["adj_bonds"] >= 0).sum(axis=1)
        )


def test_parse_errors():
    from nvmolkit_tpu.chem.smiles import SmilesParseError

    for bad in ["C(", "C1CC", "[Xx]", "C)", "c1ccccc1]"]:
        with pytest.raises(SmilesParseError):
            mol_from_smiles(bad)


def test_manual_mol_construction():
    m = Mol()
    a0 = m.add_atom(Atom(atomic_num=6))
    a1 = m.add_atom(Atom(atomic_num=8))
    m.add_bond(a0, a1, BondType.DOUBLE)
    m.finalize()
    assert m.atoms[0].total_hs == 2  # formaldehyde
    assert m.atoms[1].total_hs == 0


def test_conformers():
    m = mol_from_smiles("CCO")
    coords = np.zeros((3, 3))
    m.add_conformer(coords)
    assert len(m.conformers) == 1
    with pytest.raises(ValueError):
        m.add_conformer(np.zeros((2, 3)))
