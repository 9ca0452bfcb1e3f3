"""Substructure search tests (reference ``test_substructure.py`` role:
parity vs known-by-construction matches)."""
import numpy as np
import pytest

from nvmolkit_tpu.chem import mol_from_smiles
from nvmolkit_tpu.chem.smarts import SmartsParseError, parse_smarts
from nvmolkit_tpu.substructure import (
    SubstructSearchConfig,
    countSubstructMatches,
    getSubstructMatches,
    hasSubstructMatch,
)


def _matches(target_smiles, smarts, **cfg):
    t = mol_from_smiles(target_smiles)
    config = SubstructSearchConfig(**cfg) if cfg else None
    res = getSubstructMatches([t], [smarts], config)
    return res.matches(0, 0)


def test_simple_chain():
    m = _matches("CCO", "CO")
    assert m == [(1, 2)]


def test_uniquify_symmetric():
    # ethane C-C: two directed mappings, one unique atom set
    assert len(_matches("CC", "CC")) == 1
    assert len(_matches("CC", "CC", uniquify=False)) == 2


def test_benzene_aromatic():
    assert len(_matches("c1ccccc1", "c1ccccc1", uniquify=False)) == 12
    assert len(_matches("c1ccccc1", "c1ccccc1")) == 1
    assert _matches("C1CCCCC1", "c1ccccc1") == []  # aliphatic ring no match


def test_aromatic_vs_aliphatic_atom():
    assert _matches("c1ccccc1", "C") == []
    assert len(_matches("c1ccccc1", "c")) == 6
    assert len(_matches("c1ccccc1", "a")) == 6
    assert len(_matches("CCO", "A")) == 3


def test_element_and_charge():
    assert len(_matches("CC(=O)[O-]", "[O-]")) == 1
    assert len(_matches("CC(=O)[O-]", "[#8]")) == 2
    assert _matches("CCO", "[N]") == []


def test_degree_and_hcount():
    assert len(_matches("CC(C)C", "[CH3]")) == 3   # three methyls
    assert len(_matches("CC(C)C", "[CH1]")) == 1
    assert len(_matches("CC(C)C", "[CX4]")) == 4
    assert len(_matches("CC(C)C", "[D3]")) == 1    # central carbon


def test_ring_primitives():
    assert len(_matches("C1CCCCC1C", "[R]")) == 6
    assert len(_matches("C1CCCCC1C", "[!R]")) == 1
    assert len(_matches("C1CC1CCC1CCCC1", "[r3]")) == 3
    assert len(_matches("C1CC1CCC1CCCC1", "[r5]")) == 5


def test_bond_kinds():
    assert len(_matches("C=CC", "C=C")) == 1
    assert _matches("CCC", "C=C") == []
    assert len(_matches("C=CC", "C~C", uniquify=False)) == 4
    assert len(_matches("C#N", "C#N")) == 1
    # ring-bond query
    assert len(_matches("C1CCCCC1C", "C@C", uniquify=False)) == 12
    assert len(_matches("C1CCCCC1C", "C!@C", uniquify=False)) == 2


def test_negation_and_or():
    assert len(_matches("CCO", "[!O]")) == 2
    assert len(_matches("CCO", "[C,O]")) == 3
    assert len(_matches("CC(=O)O", "[CX3](=O)[OX2H1]")) == 1  # carboxylic acid


def test_recursive_smarts():
    # carbon attached to a hydroxyl
    m = _matches("CCO", "[C$(CO)]")
    assert m == [(1,)]
    # aromatic carbon ortho to nitrogen in pyridine
    m = _matches("c1ccncc1", "[c$(cn)]")
    assert len(m) == 2


def test_multiple_targets_queries_csr():
    targets = [mol_from_smiles(s) for s in ["CCO", "CC(=O)O", "c1ccccc1"]]
    queries = ["O", "c"]
    res = getSubstructMatches(targets, queries)
    counts = res.counts()
    assert counts.shape == (3, 2)
    np.testing.assert_array_equal(counts[:, 0], [1, 2, 0])
    np.testing.assert_array_equal(counts[:, 1], [0, 0, 6])
    assert res.matches(1, 0) == [(2,), (3,)]


def test_count_and_has():
    targets = [mol_from_smiles(s) for s in ["CCO", "CCC"]]
    counts = countSubstructMatches(targets, ["CO"])
    np.testing.assert_array_equal(counts, [[1], [0]])
    has = hasSubstructMatch(targets, ["CO", "CC"])
    np.testing.assert_array_equal(has, [[True, True], [False, True]])


def test_max_matches_cap():
    t = mol_from_smiles("C" * 20)
    res = getSubstructMatches([t], ["CC"], SubstructSearchConfig(maxMatches=5))
    assert res.counts()[0, 0] == 5
    assert (0, 0) in res.overflowed


def test_parse_errors():
    for bad in ["", "C(", "[Qq]", "C%1", "[C"]:
        with pytest.raises(SmartsParseError):
            parse_smarts(bad)


def test_functional_group_library():
    """Classic functional-group SMARTS against known molecules."""
    lib = {
        "ester": "[CX3](=O)[OX2][#6]",
        "amide": "[CX3](=O)[NX3]",
        "nitro": "[NX3](=O)=O",
        "sulfonamide": "[SX4](=O)(=O)[NX3]",
        "phenol": "[OX2H1]c",
    }
    probes = {
        "CC(=O)OC": {"ester"},
        "CC(=O)NC": {"amide"},
        "O=[N](=O)c1ccccc1": {"nitro"},
        "NS(=O)(=O)c1ccccc1": {"sulfonamide"},
        "Oc1ccccc1": {"phenol"},
    }
    targets = [mol_from_smiles(s) for s in probes]
    names = list(lib)
    has = hasSubstructMatch(targets, [lib[n] for n in names])
    for ti, (smi, expect) in enumerate(probes.items()):
        got = {names[qi] for qi in range(len(names)) if has[ti, qi]}
        assert got == expect, f"{smi}: got {got}, expected {expect}"


def test_vf2_matches_gsi(mols100):
    """Both algorithms produce identical match sets (mutual oracles)."""
    from nvmolkit_tpu.substructure import SubstructAlgorithm

    queries = ["c1ccccc1", "[CX3](=O)[OX2H1]", "[C$(CO)]", "C~C~C", "[R]"]
    targets = mols100[:40]
    gsi = getSubstructMatches(targets, queries)
    vf2 = getSubstructMatches(
        targets, queries, SubstructSearchConfig(algorithm=SubstructAlgorithm.VF2)
    )
    np.testing.assert_array_equal(gsi.counts(), vf2.counts())
    for ti in range(len(targets)):
        for qi in range(len(queries)):
            assert sorted(map(frozenset, gsi.matches(ti, qi))) == sorted(
                map(frozenset, vf2.matches(ti, qi))
            )
