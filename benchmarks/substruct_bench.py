"""Substructure search benchmark.

Counterpart of the reference's ``benchmarks/substruct_bench.py``:
(targets x queries) matches/sec over functional-group SMARTS.
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent))
from _common import Timer, emit, make_smiles  # noqa: E402

QUERIES = [
    "c1ccccc1",
    "[CX3](=O)[OX2H1]",
    "[CX3](=O)[NX3]",
    "[SX4](=O)(=O)[NX3]",
    "[OX2H1]",
    "C(F)(F)F",
    "[NX3;!$(NC=O)]",
    "c1ccncc1",
]


def main(n_targets: int = 2000, engine: str = "native"):
    from nvmolkit_tpu.chem.native import mols_from_smiles
    from nvmolkit_tpu.substructure import (
        SubstructSearchConfig,
        getSubstructMatches,
    )

    cfg = SubstructSearchConfig(
        useDeviceEngine=(engine == "device"),
        useNativeEngine=(engine == "native"),
    )
    targets = mols_from_smiles(make_smiles(n_targets))
    getSubstructMatches(targets[:64], QUERIES, cfg)  # warm/compile
    with Timer() as t:
        res = getSubstructMatches(targets, QUERIES, cfg)
    n_pairs = len(targets) * len(QUERIES)
    emit(
        "substructure_search",
        n_pairs / t.elapsed,
        "target-query pairs/sec",
        n_pairs=n_pairs,
        engine=engine,
        total_matches=int(res.counts().sum()),
    )


if __name__ == "__main__":
    main(
        int(sys.argv[1]) if len(sys.argv) > 1 else 2000,
        sys.argv[2] if len(sys.argv) > 2 else "native",
    )
