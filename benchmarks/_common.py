"""Shared benchmark harness utilities.

Counterpart of the reference's ``benchmarks/`` input/timing scaffolding
(nanobench + vs-RDKit scripts). Since this environment ships no ChEMBL
data, molecule sets are generated: scaffold x substituent enumeration
over drug-like fragments yields unique, parseable, ChEMBL-sized
molecules deterministically.
"""
from __future__ import annotations

import itertools
import json
import sys
import time
from pathlib import Path

# make the repo importable when running `python benchmarks/<x>.py`
_ROOT = str(Path(__file__).resolve().parents[1])
if _ROOT not in sys.path:
    sys.path.insert(0, _ROOT)


SCAFFOLDS = [
    "c1ccc({X})cc1",
    "c1ccc2ccc({X})cc2c1",
    "c1ccc(cc1)C(=O)N{X}",
    "c1ccncc1{X}",
    "C1CCN(CC1){X}",
    "c1ccc2[nH]c({X})cc2c1",
    "O=C(O)C({X})CC",
    "CC(C)({X})CC(=O)O",
    "c1ccc(cc1)S(=O)(=O)N{X}",
    "C1CCC(CC1)({X})O",
]

SUBSTITUENTS = [
    "C", "CC", "CCC", "CC(C)C", "CCO", "CCN", "COC", "C(=O)C", "C(=O)OC",
    "C(=O)N", "CF", "C(F)(F)F", "CCl", "CBr", "CCS", "CC#N", "CCCN",
    "CC(C)O", "CCOC", "CN(C)C", "CC(=O)O", "CCCC", "CCCCC", "CC=C",
    "CCNC", "COCC", "CSC", "CC(N)C", "C(O)CO", "CC(C)(C)C",
]


def make_smiles(n: int) -> list[str]:
    """n deterministic drug-like SMILES (scaffold x substituent grid)."""
    out: list[str] = []
    for a, sc in itertools.product(SUBSTITUENTS, SCAFFOLDS):
        out.append(sc.replace("{X}", a))
        if len(out) >= n:
            return out
    for a, b in itertools.product(SUBSTITUENTS, repeat=2):
        for sc in SCAFFOLDS:
            out.append(sc.replace("{X}", a + b))
            if len(out) >= n:
                return out
    for a, b, c in itertools.product(SUBSTITUENTS, repeat=3):
        for sc in SCAFFOLDS:
            out.append(sc.replace("{X}", a + b + c))
            if len(out) >= n:
                return out
    raise ValueError(f"can only generate {len(out)} unique molecules")


DRUG_CORES = [
    "c1ccc({X})cc1",
    "c1ccc2ccc({X})cc2c1",
    "c1ccc({X})cn1",
    "c1ccc2[nH]c({X})cc2c1",
    "C1CCN(CC1){X}",
]
DRUG_LINKERS = ["C(=O)N", "S(=O)(=O)N", "CC(=O)N", "OC", "NC(=O)C"]


def make_druglike_smiles(n: int, n_cores: int = 5) -> list[str]:
    """n deterministic drug-sized SMILES (~50-60 atoms at n_cores=5):
    aryl cores chained by amide/sulfonamide/ether linkers with three
    substituents — the size class of real screening libraries, where
    the reference's substructure benchmarks operate."""
    out: list[str] = []
    for combo in itertools.product(
        itertools.product(SUBSTITUENTS, repeat=3),
        range(len(DRUG_CORES)),
        DRUG_LINKERS,
        DRUG_LINKERS,
    ):
        (a, b, c), ci, lk, lk2 = combo
        inner = a + b + c
        for _ in range(n_cores - 1):
            inner = lk2 + "c1ccc(" + inner + ")cc1"
        out.append(DRUG_CORES[ci].replace("{X}", lk + inner))
        if len(out) >= n:
            return out
    raise ValueError(f"can only generate {len(out)} unique molecules")


def emit(metric: str, value: float, unit: str, baseline: float | None = None, **extra):
    rec = {"metric": metric, "value": value, "unit": unit}
    if baseline is not None:
        rec["vs_baseline"] = value / baseline
    rec.update(extra)
    print(json.dumps(rec))


class Timer:
    def __enter__(self):
        self.t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.elapsed = time.perf_counter() - self.t0
