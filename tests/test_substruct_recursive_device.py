"""On-device recursive SMARTS: the $(...) root masks are evaluated
leaf-first on device (ops/substruct_device._ensure_recursive_masks, the
reference's recursive_preprocessor.h:29-80 role) and fed into label
painting — recursive queries no longer drain to the host engines.

Cross-checks the device engine against the host reference engine and
the public API on recursive fixtures, including nested recursion and
negated recursive predicates.
"""
from __future__ import annotations

import numpy as np
import pytest

from nvmolkit_tpu.chem.native import mols_from_smiles
from nvmolkit_tpu.chem.smarts import parse_smarts
from nvmolkit_tpu.ops.substruct import featurize_target, find_matches
from nvmolkit_tpu.ops.substruct_device import (
    DeviceTargetLibrary,
    compile_query,
    device_substruct_matches,
)

TARGETS = [
    "CCO", "CC(=O)NC", "c1ccccc1CC(=O)O", "CC(=O)OC1=CC=CC=C1C(=O)O",
    "c1ccncc1", "OCC(O)C(O)CO", "CC(C)CC1=CC=C(C=C1)C(C)C(=O)O",
    "CN1C=NC2=C1C(=O)N(C)C(=O)N2C", "C1CCCCC1", "CCN(CC)CC",
]

RECURSIVE_QUERIES = [
    "[$(CO)]",                 # simple recursive root
    "[C$(CO)]C",               # recursive AND element, with a neighbor
    "[!$(NC=O)]",              # negated recursive
    "[NX3;!$(NC=O)]",          # amine but not amide N
    "[$([CX4][OX2H1])]",       # nested property logic inside $()
    "[c;$(c1ccccc1)]",         # aromatic ring recursive
    "[$([C$(CO)])]",           # NESTED recursion
    "[O;$(OC)]",               # rooted at O
]


def _mols():
    return mols_from_smiles(TARGETS)


@pytest.fixture(scope="module")
def setup():
    mols = _mols()
    tfs = [featurize_target(m) for m in mols]
    qmols = [parse_smarts(s) for s in RECURSIVE_QUERIES]
    compiled = [compile_query(q) for q in qmols]
    return tfs, qmols, compiled


def test_recursive_queries_compile_for_device(setup):
    _tfs, _qmols, compiled = setup
    for smarts, cq in zip(RECURSIVE_QUERIES, compiled):
        assert cq is not None, smarts
        assert cq.has_recursive, smarts
        assert cq.recursive_ok, smarts


def test_device_matches_host_on_recursive(setup):
    tfs, qmols, compiled = setup
    pairs = [(ti, qi) for ti in range(len(tfs)) for qi in range(len(qmols))]
    results, unresolved, capped = device_substruct_matches(
        pairs, tfs, qmols, compiled, uniquify=False,
        library=DeviceTargetLibrary(tfs),
    )
    # nothing drains: every recursive query runs on device
    assert not unresolved
    assert not capped
    for (ti, qi) in pairs:
        host_rows, _over = find_matches(qmols[qi], tfs[ti], uniquify=False)
        dev_rows = results[(ti, qi)]
        assert sorted(map(tuple, dev_rows)) == sorted(map(tuple, host_rows)), (
            TARGETS[ti], RECURSIVE_QUERIES[qi]
        )


def test_device_counts_match_host_on_recursive(setup):
    tfs, qmols, compiled = setup
    pairs = [(ti, qi) for ti in range(len(tfs)) for qi in range(len(qmols))]
    results, unresolved, _ = device_substruct_matches(
        pairs, tfs, qmols, compiled, uniquify=False, counts_only=True,
        library=DeviceTargetLibrary(tfs),
    )
    assert not unresolved
    for (ti, qi) in pairs:
        host_rows, _ = find_matches(qmols[qi], tfs[ti], uniquify=False)
        assert results[(ti, qi)] == len(host_rows)


def test_public_api_recursive_on_device():
    """The public search no longer routes recursive queries to the
    native drain when the device engine is selected."""
    from nvmolkit_tpu.substructure import SubstructSearchConfig, getSubstructMatches

    mols = _mols()
    cfg = SubstructSearchConfig(useDeviceEngine=True, uniquify=True)
    out = getSubstructMatches(mols, RECURSIVE_QUERIES, cfg)
    cfg_host = SubstructSearchConfig(useDeviceEngine=False, useNativeEngine=False,
                                     uniquify=True)
    ref = getSubstructMatches(mols, RECURSIVE_QUERIES, cfg_host)
    for ti in range(len(mols)):
        for qi in range(len(RECURSIVE_QUERIES)):
            assert sorted(out.matches(ti, qi)) == sorted(ref.matches(ti, qi)), (
                TARGETS[ti], RECURSIVE_QUERIES[qi]
            )


def test_uncompilable_subpattern_drains():
    """A $() sub-pattern too large for the device buckets marks the
    query recursive_ok=False and the pair drains to the host."""
    big = "[$(" + "C" * 80 + ")]"
    q = parse_smarts(big)
    cq = compile_query(q)
    if cq is not None:
        assert not cq.recursive_ok
