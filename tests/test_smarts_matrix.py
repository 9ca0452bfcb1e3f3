"""SMARTS semantics matrix: every primitive x every engine x an oracle.

The reference validates its substructure engines with large SMARTS
feature matrices cross-checked against RDKit (``tests/test_query.cu``
789 LoC, ``test_boolean_tree.cu`` 1,548 LoC, ``test_graph_labeler.cu``
1,912 LoC, ``testutils/substruct_validation.cu``). This module is that
matrix for the TPU rebuild, with TWO independent cross-checks:

1. A scalar brute-force oracle implemented HERE, from the SMARTS spec:
   recursive-descent evaluation of the parsed predicate tree against
   ``Atom``/``Bond`` objects (a totally different code path from the
   engines' vectorized ``TargetFeatures`` programs), driving a plain
   injective-DFS matcher.
2. Hand-derived expected match sets/counts for canonical chemistry
   cases (functional groups, ring primitives, charge, isotopes, ...).

Every (target, query) cell is asserted equal across the python GSI
engine, the python VF2 engine, the native C++ engine, the TPU device
engine (CPU backend in tests — same jitted program), and the oracle.
"""
from __future__ import annotations

import itertools

import numpy as np
import pytest

from nvmolkit_tpu.chem import mol_from_smiles
from nvmolkit_tpu.chem.mol import BondType, Mol
from nvmolkit_tpu.chem.rings import get_ring_membership_counts
from nvmolkit_tpu.chem.smarts import AND, LEAF, NOT, OR, Expr, QueryMol, parse_smarts
from nvmolkit_tpu.substructure import (
    SubstructAlgorithm,
    SubstructSearchConfig,
    getSubstructMatches,
)

# ---------------------------------------------------------------------------
# Scalar oracle: spec-level SMARTS evaluation over Atom/Bond objects
# ---------------------------------------------------------------------------


def _oracle_atom_props(mol: Mol, i: int) -> dict:
    """Per-atom properties computed scalar-style, independently of
    ``ops.substruct.featurize_target``'s vectorized arrays."""
    a = mol.atoms[i]
    valence = 0
    ring_bonds = 0
    for bi in mol.atom_bonds(i):
        b = mol.bonds[bi]
        if b.bond_type == BondType.DOUBLE:
            valence += 2
        elif b.bond_type == BondType.TRIPLE:
            valence += 3
        else:
            valence += 1
        if b.in_ring:
            ring_bonds += 1
    ring_counts = get_ring_membership_counts(mol)
    return {
        "atomic_num": a.atomic_num,
        "is_aromatic": int(a.is_aromatic),
        "charge": a.formal_charge,
        "degree": mol.degree(i),
        "connections": mol.degree(i) + a.total_hs,
        "total_hs": a.total_hs,
        "implicit_hs": a.implicit_hs,
        "in_ring": int(a.in_ring),
        "min_ring_size": a.min_ring_size,
        "ring_bonds": ring_bonds,
        "valence": valence + a.total_hs,
        "isotope": a.isotope,
        "ring_count": int(ring_counts[i]),
    }


def _oracle_eval(expr: Expr, mol: Mol, i: int) -> bool:
    if expr.kind == LEAF:
        if expr.prop == "true":
            return True
        if expr.prop == "recursive":
            return _oracle_anchored_match(mol, i, expr.pattern)
        return _oracle_atom_props(mol, i)[expr.prop] == expr.value
    if expr.kind == NOT:
        return not _oracle_eval(expr.children[0], mol, i)
    if expr.kind == AND:
        return all(_oracle_eval(c, mol, i) for c in expr.children)
    if expr.kind == OR:
        return any(_oracle_eval(c, mol, i) for c in expr.children)
    raise AssertionError(expr.kind)


def _oracle_bond_ok(qbond, mol: Mol, a: int, b: int) -> bool:
    bond = mol.bond_between(a, b)
    if bond is None:
        return False
    if "any" in qbond.kinds:
        ok = True
    else:
        ok = False
        for k in qbond.kinds:
            if k == "ring":
                ok |= bond.in_ring
            elif k == "single":
                ok |= bond.bond_type == BondType.SINGLE
            elif k == "double":
                ok |= bond.bond_type == BondType.DOUBLE
            elif k == "triple":
                ok |= bond.bond_type == BondType.TRIPLE
            elif k == "aromatic":
                ok |= bond.bond_type == BondType.AROMATIC
    return (not ok) if qbond.negate else ok


def _oracle_component_matches(mol: Mol, query: QueryMol) -> list[tuple[int, ...]]:
    """All injective mappings of a CONNECTED query via plain DFS."""
    nq = query.num_atoms
    # candidates per query atom
    cand = [
        [t for t in range(mol.num_atoms) if _oracle_eval(query.atoms[q].expr, mol, t)]
        for q in range(nq)
    ]
    # query traversal order: BFS from atom 0 so each new atom has a
    # mapped neighbor (query is connected within a component)
    order, seen = [0], {0}
    for u in order:
        for v, _bi in query.neighbors(u):
            if v not in seen:
                seen.add(v)
                order.append(v)
    assert len(order) == nq, "component must be connected"

    results: list[tuple[int, ...]] = []
    mapping = [-1] * nq

    def extend(k: int):
        if k == nq:
            results.append(tuple(mapping))
            return
        q = order[k]
        for t in cand[q]:
            if t in mapping:
                continue
            mapping[q] = t
            ok = True
            for v, bi in query.neighbors(q):
                if mapping[v] >= 0 and not _oracle_bond_ok(
                    query.bonds[bi], mol, t, mapping[v]
                ):
                    ok = False
                    break
            if ok:
                extend(k + 1)
            mapping[q] = -1

    extend(0)
    return results


def _oracle_matches(mol: Mol, query: QueryMol) -> set[tuple[int, ...]]:
    """All injective mappings, handling disconnected queries by
    cartesian product with whole-query injectivity (RDKit semantics)."""
    from nvmolkit_tpu.ops.substruct import split_components

    parts = split_components(query)
    per = []
    for sub, atom_ids in parts:
        ms = _oracle_component_matches(mol, sub)
        per.append((atom_ids, ms))
        if not ms:
            return set()
    out = set()
    nq = query.num_atoms
    for combo in itertools.product(*(ms for _ids, ms in per)):
        full = [-1] * nq
        used = set()
        ok = True
        for (atom_ids, _ms), m in zip(per, combo):
            for qa, ta in zip(atom_ids, m):
                if ta in used:
                    ok = False
                    break
                used.add(ta)
                full[qa] = ta
            if not ok:
                break
        if ok:
            out.add(tuple(full))
    return out


def _oracle_anchored_match(mol: Mol, t: int, pattern: QueryMol) -> bool:
    """Recursive-SMARTS leaf: pattern's atom 0 anchored at target t."""
    for m in _oracle_component_matches(mol, pattern):
        if m[0] == t:
            return True
    # disconnected recursive patterns are not generated by the parser's
    # `$()` bodies in these fixtures; component 0 anchoring suffices
    return False


# ---------------------------------------------------------------------------
# Engine drivers
# ---------------------------------------------------------------------------

_ENGINES = {
    "py_gsi": SubstructSearchConfig(useNativeEngine=False, useDeviceEngine=False),
    "py_vf2": SubstructSearchConfig(
        useNativeEngine=False,
        useDeviceEngine=False,
        algorithm=SubstructAlgorithm.VF2,
    ),
    "native": SubstructSearchConfig(useNativeEngine=True, useDeviceEngine=False),
    "device": SubstructSearchConfig(useDeviceEngine=True),
}


def _engine_match_sets(targets, queries, cfg):
    res = getSubstructMatches(targets, queries, cfg)
    out = {}
    for ti in range(len(targets)):
        for qi in range(len(queries)):
            out[(ti, qi)] = set(res.matches(ti, qi))
    return out


# ---------------------------------------------------------------------------
# The matrix
# ---------------------------------------------------------------------------

MATRIX_TARGETS = [
    "CCO",                              # ethanol
    "CC(=O)O",                          # acetic acid
    "CC(=O)OC",                         # methyl acetate
    "CC(=O)N",                          # acetamide
    "CC(=O)[O-]",                       # acetate anion
    "C[N+](C)(C)C",                     # tetramethylammonium
    "CC#N",                             # acetonitrile
    "C=CC=C",                           # butadiene
    "c1ccccc1",                         # benzene
    "c1ccncc1",                         # pyridine
    "c1cc[nH]c1",                       # pyrrole
    "c1ccc2ccccc2c1",                   # naphthalene
    "C1CC1",                            # cyclopropane
    "C1CCCCC1",                         # cyclohexane
    "C1CC1CC1CCCC1",                    # fused-free bicyclic chain
    "OC(=O)c1ccccc1OC(C)=O",            # aspirin
    "CC(C)CC1=CC=C(C=C1)C(C)C(=O)O",    # ibuprofen
    "CN1C=NC2=C1C(=O)N(C)C(=O)N2C",     # caffeine
    "NCC(=O)O",                         # glycine
    "FC(F)(F)c1ccc(Cl)cc1",             # halogenated arene
    "CS(=O)(=O)N",                      # methanesulfonamide
    "C[13CH2]O",                        # isotope-labeled ethanol
    "CCSCC",                            # sulfide
    "O=[N+]([O-])c1ccccc1",             # nitrobenzene
]

MATRIX_QUERIES = [
    # elements / aromaticity
    "[#6]", "[#7]", "[#8]", "C", "c", "N", "O", "[O]", "a", "A", "*",
    # H counts / degree / connectivity / valence
    "[CH3]", "[CH2]", "[CH0]", "[D1]", "[D3]", "[X4]", "[X3]", "[v4]",
    "[h2]", "[#6;H1]",
    # rings
    "[R]", "[!R]", "[r3]", "[r5]", "[r6]", "[R2]", "[x2]", "[cR2]",
    # charge / isotope
    "[+]", "[-]", "[+0]", "[13C]", "[0#6]",
    # logic
    "[C,N]", "[!C;!N]", "[c;!$(cn)]", "[N&X3]", "[!#1;!#6]",
    # bonds
    "C-C", "C=C", "C#N", "c:c", "C~N", "C@C", "C!@C", "[#6]~[#8]",
    # multi-atom chemistry
    "[CX3](=O)[OX2H1]",                 # carboxylic acid
    "[CX3](=O)[OX2][#6]",               # ester
    "[CX3](=O)[NX3]",                   # amide
    "[SX4](=O)(=O)[NX3]",               # sulfonamide
    "[NX3][CX3](=[OX1])",               # amide (from N)
    "O=[N+][O-]",                       # nitro
    "[F,Cl,Br,I]",                      # halogen
    "c1ccccc1",                         # benzene ring
    "c1ccncc1",                         # pyridine ring
    "[nH]",                             # pyrrole N
    # recursive
    "[$(CO)]", "[C$(C(=O)O)]", "[!$(C=O)]", "[c$(c(:c):n)]",
    # disconnected
    "C.O", "O.O",
]


@pytest.fixture(scope="module")
def matrix_mols():
    return [mol_from_smiles(s) for s in MATRIX_TARGETS]


@pytest.fixture(scope="module")
def engine_results(matrix_mols):
    return {
        name: _engine_match_sets(matrix_mols, MATRIX_QUERIES, cfg)
        for name, cfg in _ENGINES.items()
    }


def test_all_engines_agree_on_full_matrix(engine_results):
    base = engine_results["py_gsi"]
    for name in ("py_vf2", "native", "device"):
        other = engine_results[name]
        for key in base:
            assert other[key] == base[key], (
                name,
                MATRIX_TARGETS[key[0]],
                MATRIX_QUERIES[key[1]],
            )


def test_oracle_agrees_on_full_matrix(matrix_mols, engine_results):
    base = engine_results["py_gsi"]
    for ti, mol in enumerate(matrix_mols):
        for qi, q in enumerate(MATRIX_QUERIES):
            want = _oracle_matches(mol, parse_smarts(q))
            assert base[(ti, qi)] == want, (MATRIX_TARGETS[ti], q)


# ---------------------------------------------------------------------------
# Hand-derived anchors (independent of both implementations)
# ---------------------------------------------------------------------------

# (target, query, expected set of ordered match tuples)
ANCHORS = [
    ("CCO", "[OX2H1]", {(2,)}),
    ("CCO", "[CH3]", {(0,)}),
    ("CCO", "CCO", {(0, 1, 2)}),
    ("CCO", "OCC", {(2, 1, 0)}),
    ("CC(=O)O", "[CX3](=O)[OX2H1]", {(1, 2, 3)}),
    ("CC(=O)OC", "[CX3](=O)[OX2][#6]", {(1, 2, 3, 4)}),
    ("CC(=O)N", "[CX3](=O)[NX3]", {(1, 2, 3)}),
    ("CC(=O)[O-]", "[-]", {(3,)}),
    ("CC(=O)[O-]", "[O-]", {(3,)}),
    ("C[N+](C)(C)C", "[+]", {(1,)}),
    ("C[N+](C)(C)C", "[NX4+]", {(1,)}),
    ("CC#N", "C#N", {(1, 2)}),
    ("CC#N", "[NX1]", {(2,)}),
    ("c1ccncc1", "[nX2]", {(3,)}),
    ("c1cc[nH]c1", "[nH]", {(3,)}),
    ("C[13CH2]O", "[13C]", {(1,)}),
    ("C[13CH2]O", "[13CH2]", {(1,)}),
    ("CS(=O)(=O)N", "[SX4]", {(1,)}),
    ("O=[N+]([O-])c1ccccc1", "O=[N+][O-]", {(0, 1, 2)}),
    ("NCC(=O)O", "[NX3;H2]", {(0,)}),
    ("C1CC1", "[r3]", {(0,), (1,), (2,)}),
    ("C1CC1", "C1CC1", {p for p in itertools.permutations((0, 1, 2))}),
]


@pytest.mark.parametrize("target,query,want", ANCHORS)
def test_hand_anchor(target, query, want):
    mol = mol_from_smiles(target)
    for name, cfg in _ENGINES.items():
        res = getSubstructMatches([mol], [query], cfg)
        got = set(res.matches(0, 0))
        assert got == want, (name, target, query, got)


# hand-derived COUNT anchors where enumerating tuples is unwieldy
COUNT_ANCHORS = [
    ("c1ccccc1", "c1ccccc1", 12),   # 6 rotations x 2 directions
    ("c1ccccc1", "c", 6),
    ("c1ccccc1", "cc", 12),
    ("c1ccccc1", "c:c", 12),
    ("c1ccccc1", "C", 0),
    ("C1CCCCC1", "C@C", 12),
    ("C1CCCCC1", "C!@C", 0),
    ("c1ccc2ccccc2c1", "[cR2]", 2),     # the two fusion atoms
    ("c1ccc2ccccc2c1", "[x3]", 2),
    ("c1ccc2ccccc2c1", "c1ccccc1", 24),  # both rings x 12
    ("C=CC=C", "C=C", 4),
    ("C=CC=C", "C=CC=C", 2),
    ("C=CC=C", "C~C", 6),
    ("CCSCC", "[#16X2]", 1),
    ("FC(F)(F)c1ccc(Cl)cc1", "[F,Cl,Br,I]", 4),
    # caffeine's carbonyl carbons are AROMATIC under the RDKit
    # aromaticity model this framework implements (exocyclic C=O in an
    # aromatic ring), so the classic [CX3]=[OX1] (aliphatic C) finds 0
    # and the element query finds both
    ("CN1C=NC2=C1C(=O)N(C)C(=O)N2C", "[CX3]=[OX1]", 0),
    ("CN1C=NC2=C1C(=O)N(C)C(=O)N2C", "[#6]=[OX1]", 2),
    ("OC(=O)c1ccccc1OC(C)=O", "[CX3](=O)[OX2H1]", 1),
    ("OC(=O)c1ccccc1OC(C)=O", "[CX3](=O)[OX2][#6]", 1),
    ("CCO", "C.O", 2),              # (C0,O), (C1,O)
    ("CCO", "O.O", 0),              # only one oxygen: injectivity
    ("CC(C)(C)C", "[CH3]", 4),
    ("CC(C)(C)C", "[CX4H0]", 1),
]


@pytest.mark.parametrize("target,query,want", COUNT_ANCHORS)
def test_hand_count_anchor(target, query, want):
    mol = mol_from_smiles(target)
    for name, cfg in _ENGINES.items():
        res = getSubstructMatches([mol], [query], cfg)
        got = len(res.matches(0, 0))
        assert got == want, (name, target, query, got)


# ---------------------------------------------------------------------------
# Config-behavior cells: uniquify / maxMatches on every engine
# ---------------------------------------------------------------------------


def test_uniquify_collapses_atom_sets():
    mol = mol_from_smiles("c1ccccc1")
    for name, cfg in _ENGINES.items():
        import dataclasses as dc

        ucfg = dc.replace(cfg, uniquify=True)
        res = getSubstructMatches([mol], ["c1ccccc1"], ucfg)
        got = res.matches(0, 0)
        assert len(got) == 1, name
        assert tuple(sorted(got[0])) == (0, 1, 2, 3, 4, 5)


def test_max_matches_truncates_consistently():
    mol = mol_from_smiles("CCCCCCCC")
    import dataclasses as dc

    for name, cfg in _ENGINES.items():
        mcfg = dc.replace(cfg, maxMatches=3)
        res = getSubstructMatches([mol], ["CC"], mcfg)
        got = res.matches(0, 0)
        assert len(got) == 3, name
        # every returned tuple is a real bond
        for a, b in got:
            assert abs(a - b) == 1


def test_empty_and_missing_cells():
    mols = [mol_from_smiles("CC"), mol_from_smiles("O")]
    for name, cfg in _ENGINES.items():
        res = getSubstructMatches(mols, ["N", "O"], cfg)
        counts = res.counts()
        np.testing.assert_array_equal(counts, [[0, 0], [0, 1]], err_msg=name)


# ---------------------------------------------------------------------------
# Oracle-vs-engine on randomized ring systems (beyond the fixed matrix)
# ---------------------------------------------------------------------------

RING_SYSTEMS = [
    "C1CC2CCC1CC2",           # bicyclo[2.2.2]octane
    "C1CC12CC2",              # spiro
    "c1ccc2c(c1)cccc2",       # naphthalene alt writing
    "C1CC2(CC1)CCCC2",        # spiro[4.4]
    "C1CCC2(CC1)CCCCC2",      # spiro[5.5]
]

RING_QUERIES = ["[R]", "[R1]", "[R2]", "[x2]", "[x3]", "[r4]", "[r5]", "[r6]", "C@C"]


@pytest.mark.parametrize("target", RING_SYSTEMS)
def test_ring_primitives_on_polycyclics(target):
    mol = mol_from_smiles(target)
    for q in RING_QUERIES:
        want = _oracle_matches(mol, parse_smarts(q))
        for name, cfg in _ENGINES.items():
            res = getSubstructMatches([mol], [q], cfg)
            got = set(res.matches(0, 0))
            assert got == want, (name, target, q)
