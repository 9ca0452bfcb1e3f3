"""Device (TPU) GSI join vs host engines.

The device join (``ops/substruct_device.py``) must produce exactly the
host GSI/VF2 match sets — this mirrors the reference's GPU-vs-RDKit
substructure validation (``testutils/substruct_validation.cu``). Runs
on the CPU backend in tests; the same jitted program runs on TPU.
"""
import numpy as np
import pytest

from nvmolkit_tpu.chem import mol_from_smiles
from nvmolkit_tpu.chem.smarts import parse_smarts
from nvmolkit_tpu.ops.substruct import featurize_target, find_matches
from nvmolkit_tpu.ops.substruct_device import (
    compile_query,
    device_substruct_matches,
)
from nvmolkit_tpu.substructure import (
    SubstructSearchConfig,
    getSubstructMatches,
)

TARGETS = [
    "c1ccccc1CC(=O)O",
    "CCOCC",
    "c1ccc2ccccc2c1",
    "CC(C)CC1=CC=C(C=C1)C(C)C(=O)O",
    "c1ccncc1",
    "OC(=O)c1ccccc1OC(C)=O",
    "CN1C=NC2=C1C(=O)N(C)C(=O)N2C",
    "C1CCCCC1",
    "CC(N)C(=O)O",
    "FC(F)(F)c1ccccc1",
]
QUERIES = [
    "c1ccccc1",
    "[CX3](=O)[OX2H1]",
    "[OX2H1]",
    "C(F)(F)F",
    "c1ccncc1",
    "[#6]~[#6]~[#7]",
    "[cR2]",
    "C=O",
    "[#6]",
    "CC",
]


def _match_sets(rows):
    return {tuple(sorted(r.tolist())) for r in rows}


def test_device_join_matches_host_engine():
    tfs = [featurize_target(mol_from_smiles(s)) for s in TARGETS]
    qmols = [parse_smarts(q) for q in QUERIES]
    compiled = [compile_query(q) for q in qmols]
    pairs = [(ti, qi) for ti in range(len(tfs)) for qi in range(len(qmols))]
    dev, unresolved, capped = device_substruct_matches(
        pairs, tfs, qmols, compiled
    )
    assert not capped
    checked = 0
    for (ti, qi), rows in dev.items():
        host, _ = find_matches(qmols[qi], tfs[ti])
        assert _match_sets(rows) == _match_sets(host), (
            TARGETS[ti], QUERIES[qi]
        )
        checked += 1
    # the standard drug-like pairs must all run on device
    assert checked >= 0.9 * len(pairs)
    assert len(unresolved) + checked == len(pairs)


def test_device_engine_public_api_counts():
    targets = [mol_from_smiles(s) for s in TARGETS]
    cfg_dev = SubstructSearchConfig(useDeviceEngine=True)
    cfg_host = SubstructSearchConfig(useNativeEngine=False)
    r_dev = getSubstructMatches(targets, QUERIES, cfg_dev)
    r_host = getSubstructMatches(targets, QUERIES, cfg_host)
    np.testing.assert_array_equal(r_dev.counts(), r_host.counts())
    # full match sets (unordered) agree per pair
    for ti in range(len(TARGETS)):
        for qi in range(len(QUERIES)):
            a = {tuple(sorted(m)) for m in r_dev.matches(ti, qi)}
            b = {tuple(sorted(m)) for m in r_host.matches(ti, qi)}
            assert a == b


def test_device_join_frontier_overflow_falls_back():
    """A tiny frontier cap forces overflow; the public API must still
    return correct matches via the host fallback."""
    targets = [mol_from_smiles("c1ccc2ccccc2c1")]  # naphthalene
    cfg = SubstructSearchConfig(useDeviceEngine=True, deviceFrontierCap=8)
    r = getSubstructMatches(targets, ["[#6]", "c1ccccc1"], cfg)
    r_ref = getSubstructMatches(
        targets, ["[#6]", "c1ccccc1"],
        SubstructSearchConfig(useNativeEngine=False),
    )
    np.testing.assert_array_equal(r.counts(), r_ref.counts())


def test_device_join_max_matches_cap():
    targets = [mol_from_smiles("CCCCCCCCCC")]
    cfg = SubstructSearchConfig(useDeviceEngine=True, maxMatches=3)
    r = getSubstructMatches(targets, ["[#6]"], cfg)
    assert r.counts()[0][0] == 3
    assert (0, 0) in r.overflowed


def test_device_join_randomized_sweep(mols100):
    """Randomized cross-validation at modest scale (the reference's
    test_substruct_integration role)."""
    rng = np.random.default_rng(7)
    targets = [m for m in mols100 if m.num_atoms <= 64][:40]
    queries = ["[OX2]", "c1ccccc1", "[NX3]", "C(=O)", "[R]", "[CH3]"]
    tfs = [featurize_target(t) for t in targets]
    qmols = [parse_smarts(q) for q in queries]
    compiled = [compile_query(q) for q in qmols]
    pairs = [(ti, qi) for ti in range(len(tfs)) for qi in range(len(qmols))]
    rng.shuffle(pairs)
    dev, unresolved, _ = device_substruct_matches(pairs, tfs, qmols, compiled)
    for (ti, qi), rows in dev.items():
        host, _ = find_matches(qmols[qi], tfs[ti])
        assert _match_sets(rows) == _match_sets(host)


def test_compile_query_rejections():
    assert compile_query(parse_smarts("[#8].[#8]")) is None  # disconnected
    cq = compile_query(parse_smarts("[$(CO)]C"))
    assert cq is not None and cq.has_recursive  # drains to host


def test_bond_code_mask_semantics():
    from nvmolkit_tpu.ops.substruct_device import _bond_code_mask

    q = parse_smarts("C-C")  # explicit single, not aromatic
    mask = _bond_code_mask(q.bonds[0])
    assert (mask >> 1) & 1          # single, non-ring
    assert (mask >> 9) & 1          # single, ring
    assert not ((mask >> 4) & 1)    # aromatic rejected
    q2 = parse_smarts("C@C")        # ring bond
    m2 = _bond_code_mask(q2.bonds[0])
    assert (m2 >> 9) & 1 and not ((m2 >> 1) & 1)


def test_repeated_library_search_flat_path_and_uniquify():
    """Warm searches on a cached SubstructLibrary take the flat
    extraction path (learned total hints) and the device uniquify
    kernel; results must be identical across cold/warm runs, modes,
    and engines."""
    from nvmolkit_tpu.chem.smarts import QueryMol
    from nvmolkit_tpu.ops.substruct import find_matches
    from nvmolkit_tpu.substructure import SubstructLibrary

    mols = [mol_from_smiles(s) for s in TARGETS]
    lib = SubstructLibrary(mols)
    for uniq in (False, True):
        cfg = SubstructSearchConfig(
            useDeviceEngine=True, useNativeEngine=False, uniquify=uniq
        )
        runs = [getSubstructMatches(lib, QUERIES, cfg) for _ in range(3)]
        for ti in range(len(TARGETS)):
            for qi in range(len(QUERIES)):
                ref, _ = find_matches(
                    parse_smarts(QUERIES[qi]),
                    featurize_target(mols[ti]),
                    uniquify=uniq,
                )
                want = _match_sets([np.asarray(r) for r in ref])
                for res in runs:
                    got = _match_sets(
                        [np.asarray(m) for m in res.matches(ti, qi)]
                    )
                    assert got == want, (ti, qi, uniq)
                if uniq:
                    # uniquify = dedup by atom set: row count == set count
                    for res in runs:
                        assert len(res.matches(ti, qi)) == len(want)


def test_device_counts_with_uniquify():
    from nvmolkit_tpu.substructure import countSubstructMatches

    mols = [mol_from_smiles(s) for s in TARGETS]
    for uniq in (False, True):
        dev = countSubstructMatches(
            mols, QUERIES,
            SubstructSearchConfig(
                useDeviceEngine=True, useNativeEngine=False, uniquify=uniq
            ),
        )
        host = countSubstructMatches(
            mols, QUERIES,
            SubstructSearchConfig(useDeviceEngine=False, useNativeEngine=False,
                                  uniquify=uniq),
        )
        np.testing.assert_array_equal(dev, host)
