"""Sanitizer harness for the four csrc/ native libraries.

Runs every csrc code path (SMILES parser/featurizer, substructure BFS
join + VF2 + recursive patterns, ETK torsion matcher, topological
bounds) against their Python oracles WITHOUT importing jax — prebuilt
jaxlib throws C++ exceptions through asan's uninitialized
``__cxa_throw`` interceptor and aborts, so the sanitizer leg drives the
native code through plain numpy/ctypes instead (the reference's
sanitizer builds cover its C++ the same way, ``cmake/sanitizers.cmake``).

Usage (CI sanitize job)::

    make -C csrc clean
    make -C csrc CXXFLAGS="-O1 -g -std=c++20 -fPIC -shared -pthread \
        -fsanitize=address,undefined -fno-sanitize-recover=all"
    LD_PRELOAD=$(gcc -print-file-name=libasan.so) \
        ASAN_OPTIONS=detect_leaks=0 python tools/asan_native.py
"""
from __future__ import annotations

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

SMILES = [
    "CC(=O)Oc1ccccc1C(=O)O", "CCO", "c1ccccc1", "C1CCCCC1",
    "CC(C)Cc1ccc(cc1)C(C)C(=O)O", "CN1CCC[C@H]1c1cccnc1",
    "O=C(O)c1ccccc1O", "CC(N)Cc1ccccc1", "c1ccc2ccccc2c1", "CCN(CC)CC",
    "CC(C)(C)OC(=O)NC1CCNCC1", "O=S(=O)(N)c1ccc(Cl)cc1",
    "CCCNC(=O)CC", "FC(F)(F)c1ccccc1", "C#CCOC(=O)C",
] * 4
QUERIES = [
    "c1ccccc1", "C(=O)O", "[OH]", "[NX3]", "ccc", "C~C~C", "[R]",
    "[NX3;!$(NC=O)]", "[$([CX4][OX2H1])]", "[#6]~[#7]",
]


def main() -> int:
    from nvmolkit_tpu.chem import mol_from_smiles
    from nvmolkit_tpu.chem.native import (
        load_etk_lib,
        mols_from_smiles_native,
        native_available,
    )

    assert native_available(), "native toolchain unavailable"

    # 1. C++ SMILES parser/graph compiler vs the Python parser
    native = mols_from_smiles_native(SMILES)
    pymols = [mol_from_smiles(s) for s in SMILES]
    for smi, nm, pm in zip(SMILES, native, pymols):
        assert nm.num_atoms == pm.num_atoms, smi
        assert nm.num_bonds == pm.num_bonds, smi
        for a, b in zip(nm.atoms, pm.atoms):
            assert (a.atomic_num, a.is_aromatic, a.in_ring, a.total_hs) == (
                b.atomic_num, b.is_aromatic, b.in_ring, b.total_hs
            ), smi
    print(f"[asan] parser: {len(SMILES)} molecules OK")

    # 2. substructure: BFS join + VF2, uniquify on/off, vs Python engines
    from nvmolkit_tpu.chem.native_substruct import (
        native_substruct_available,
        native_substruct_search,
    )
    from nvmolkit_tpu.chem.smarts import parse_smarts
    from nvmolkit_tpu.ops.substruct import (
        featurize_target,
        find_matches,
        find_matches_vf2,
    )

    assert native_substruct_available()
    tfs = [featurize_target(m) for m in pymols[:20]]
    qmols = [parse_smarts(q) for q in QUERIES]
    for algo, oracle in (("gsi", find_matches), ("vf2", find_matches_vf2)):
        for uniq in (False, True):
            nat, _over = native_substruct_search(
                tfs, qmols, max_matches=10000, uniquify=uniq, algorithm=algo
            )
            for ti, tf in enumerate(tfs):
                for qi, q in enumerate(qmols):
                    py, _o = oracle(q, tf, max_matches=10000, uniquify=uniq)
                    a = {frozenset(map(int, r)) for r in nat[ti][qi]}
                    b = {frozenset(map(int, r)) for r in py}
                    assert a == b, (ti, qi, algo, uniq)
    print(f"[asan] substruct: {len(tfs)}x{len(qmols)} x2 algos x2 modes OK")

    # 3. ETK torsion matcher (C++ batch) vs the Python matcher
    from nvmolkit_tpu.models.etkdg_torsions import default_torsion_provider

    assert load_etk_lib() is not None
    tp_native = default_torsion_provider()
    ok = tp_native.precompute(pymols)
    assert ok, "native ETK matcher unavailable"
    tp_py = default_torsion_provider()
    tp_py._native_blob = None  # force the Python matcher
    for m_nat, smi in zip(pymols, SMILES):
        idx_n, co_n, ph_n = tp_native(m_nat)
        m_py = mol_from_smiles(smi)
        idx_p, co_p, ph_p = tp_py(m_py)
        assert np.array_equal(np.asarray(idx_n), np.asarray(idx_p)), smi
        assert np.allclose(co_n, co_p) and np.allclose(ph_n, ph_p), smi
    print(f"[asan] etk matcher: {len(pymols)} molecules OK")

    # 4. topological bounds (C++ batch) vs the Python builder
    from nvmolkit_tpu.chem.bounds import (
        topological_bounds,
        topological_bounds_batch,
    )

    small = [m for m in pymols if m.num_atoms <= 24][:30]
    batch = topological_bounds_batch(small, 24)
    assert batch is not None, "native bounds builder unavailable"
    ub, lb = batch
    for k, m in enumerate(small):
        u, l = topological_bounds(m)
        na = m.num_atoms
        assert np.allclose(ub[k, :na, :na], u, atol=1e-5)
        assert np.allclose(lb[k, :na, :na], l, atol=1e-5)
    print(f"[asan] topo bounds: {len(small)} molecules OK")

    # NOTE: the package __init__ imports jax (config hooks) — that is
    # safe under asan; what aborts is jaxlib C++ exception unwinding
    # during TRACING (__cxa_throw interceptor), which this harness
    # never triggers: no jnp/jit call anywhere above.
    print("[asan] ALL NATIVE PATHS CLEAN")
    return 0


if __name__ == "__main__":
    sys.exit(main())
