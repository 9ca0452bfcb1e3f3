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
    # ethane C-C: two directed mappings, one unique atom set.
    # default is uniquify=False (reference default,
    # ``nvmolkit/substructure.py:71``)
    assert len(_matches("CC", "CC")) == 2
    assert len(_matches("CC", "CC", uniquify=True)) == 1
    assert len(_matches("CC", "CC", uniquify=False)) == 2


def test_benzene_aromatic():
    assert len(_matches("c1ccccc1", "c1ccccc1", uniquify=False)) == 12
    assert len(_matches("c1ccccc1", "c1ccccc1", uniquify=True)) == 1
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
    assert len(_matches("C=CC", "C=C", uniquify=True)) == 1
    assert _matches("CCC", "C=C") == []
    assert len(_matches("C=CC", "C~C", uniquify=False)) == 4
    assert len(_matches("C#N", "C#N", uniquify=True)) == 1
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


# ---------------------------------------------------------------------------
# round 2: native C++ engine, SSSR R<n>, disconnected SMARTS
# ---------------------------------------------------------------------------

def test_rn_ring_membership_counts():
    from nvmolkit_tpu.chem.smarts import parse_smarts
    from nvmolkit_tpu.ops.substruct import featurize_target, find_matches

    naph = mol_from_smiles("c1ccc2ccccc2c1")
    tf = featurize_target(naph)
    # fusion atoms are in exactly 2 SSSR rings
    m2, _ = find_matches(parse_smarts("[R2]"), tf)
    assert len(m2) == 2
    m1, _ = find_matches(parse_smarts("[R1]"), tf)
    assert len(m1) == 8
    # R0 on a chain atom
    tol = mol_from_smiles("Cc1ccccc1")
    tf2 = featurize_target(tol)
    m0, _ = find_matches(parse_smarts("[R0]"), tf2)
    assert {int(r[0]) for r in m0} == {0}


def test_disconnected_smarts_components():
    from nvmolkit_tpu.chem.smarts import parse_smarts
    from nvmolkit_tpu.ops.substruct import featurize_target, find_matches

    m = mol_from_smiles("OCCN")
    tf = featurize_target(m)
    # two disconnected single atoms: O and N
    matches, over = find_matches(parse_smarts("[OX2H1].[NX3]"), tf)
    assert not over
    assert {tuple(r) for r in matches.tolist()} == {(0, 3)}
    # components must map to distinct atoms: O.O on a single-oxygen mol
    none, _ = find_matches(parse_smarts("[#8].[#8]"), tf)
    assert len(none) == 0
    # two oxygens -> both orderings collapse under uniquify
    m2 = mol_from_smiles("OCCO")
    both, _ = find_matches(parse_smarts("[#8].[#8]"), featurize_target(m2))
    assert {frozenset(r) for r in both.tolist()} == {frozenset((0, 3))}


def test_native_engine_available_and_used():
    from nvmolkit_tpu.chem.native_substruct import native_substruct_available

    assert native_substruct_available()
    res = getSubstructMatches(
        [mol_from_smiles("CC(=O)NC")], ["[NX3;!$(NC=O)]"],
    )
    assert res.counts().sum() == 0  # amide N excluded by recursive SMARTS


def test_native_vs_python_vs_vf2_randomized_sweep():
    """Randomized SMARTS x target cross-validation of all three engines
    (the reference's GSI-vs-RDKit validation, testutils/substruct_validation)."""
    import itertools
    from nvmolkit_tpu.chem.smarts import parse_smarts
    from nvmolkit_tpu.chem.native_substruct import native_substruct_search
    from nvmolkit_tpu.ops.substruct import (
        featurize_target, find_matches, find_matches_vf2,
    )
    from tests.data.smiles import SMILES_100

    queries = [
        "c1ccccc1", "[CX3](=O)[OX2H1]", "[CX3](=O)[NX3]", "[OX2H1]",
        "[NX3;!$(NC=O)]", "C(F)(F)F", "[R1]", "[R2]", "[r6]", "[x2]",
        "[$([CX4][OX2H1])]", "c1ccncc1", "[#6;!R]", "[SX2]",
        "[CH3][CH2]", "[c;$(c1ccccc1)]", "O=C", "[!#6;!#1]",
    ]
    targets = [mol_from_smiles(s) for s in SMILES_100[:40]]
    qmols = [parse_smarts(q) for q in queries]
    tfs = [featurize_target(t) for t in targets]
    nm, _ = native_substruct_search(tfs, qmols, 10000, True, 1)
    for (ti, tf), (qi, q) in itertools.product(enumerate(tfs), enumerate(qmols)):
        s_py = {tuple(r) for r in find_matches(q, tf)[0].tolist()}
        s_vf = {tuple(r) for r in find_matches_vf2(q, tf)[0].tolist()}
        s_na = {tuple(r) for r in nm[ti][qi].tolist()}
        assert s_py == s_vf == s_na, (queries[qi], ti)


def test_worker_threads_config_changes_nothing_semantically():
    mols = [mol_from_smiles(s) for s in ("CCO", "c1ccccc1C(=O)O", "CCN")]
    q = ["O=C", "[OX2H1]"]
    r1 = getSubstructMatches(mols, q, SubstructSearchConfig(workerThreads=1))
    r2 = getSubstructMatches(mols, q, SubstructSearchConfig(workerThreads=4))
    assert (r1.counts() == r2.counts()).all()


def test_python_engine_fallback_flag():
    mols = [mol_from_smiles("c1ccccc1O")]
    q = ["[OX2H1]"]
    r_native = getSubstructMatches(mols, q)
    r_python = getSubstructMatches(
        mols, q, SubstructSearchConfig(useNativeEngine=False)
    )
    assert (r_native.counts() == r_python.counts()).all()
