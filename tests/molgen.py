"""Seeded random-molecule generator for property-based differential tests.

Generates random VALID SMILES over the supported element set by
construction (growing a random tree of fragments with explicit ring
closures), so tests can sweep hundreds of structures without an
external dataset — the role of the reference's ChEMBL fixtures
(SURVEY §4.1) in a zero-egress image.

Deliberately adversarial knobs:
  * exact atom-count targeting (bucket-boundary sizes 15/16/17, ...)
  * charges, isotopes-free brackets, multiple ring systems, fused rings
  * heteroaromatics, halogens, branching up to valence
"""
from __future__ import annotations

import random

# (symbol, max further bonds when added with a single bond)
_CHAIN_ATOMS = [
    ("C", 3), ("C", 3), ("C", 3), ("N", 2), ("O", 1), ("S", 1),
    ("F", 0), ("Cl", 0), ("Br", 0),
]
_AROMATIC_RINGS = [
    "c1ccccc1",        # benzene
    "c1ccncc1",        # pyridine
    "c1ccoc1",         # furan
    "c1ccsc1",         # thiophene
    "c1cc[nH]c1",      # pyrrole
]
_ALI_RING_SIZES = (3, 4, 5, 6, 7)


def _ring_smiles(rng: random.Random, closure: int) -> tuple[str, int]:
    """A random ring written inline with the given closure digit.
    Returns (smiles, n_atoms)."""
    if rng.random() < 0.5:
        frag = rng.choice(_AROMATIC_RINGS)
        # re-digit the closure
        frag = frag.replace("1", str(closure))
        n = sum(1 for ch in frag if ch in "cnos") + frag.count("[nH]") * 0
        return frag, n
    size = rng.choice(_ALI_RING_SIZES)
    atoms = []
    for _ in range(size):
        sym = "C" if rng.random() < 0.8 else rng.choice(["N", "O", "S"])
        atoms.append(sym)
    body = atoms[0] + str(closure) + "".join(atoms[1:]) + str(closure)
    return body, size


def random_smiles(rng: random.Random, n_heavy: int) -> str:
    """One random SMILES with roughly (never more than) ``n_heavy``
    heavy atoms; the exact count is returned by the parser, and
    :func:`random_smiles_exact` targets counts exactly."""
    out: list[str] = []
    count = 0
    closure = 1
    budget = n_heavy
    while count < n_heavy:
        room = n_heavy - count
        r = rng.random()
        if r < 0.25 and room >= 5 and closure <= 8:
            frag, n = _ring_smiles(rng, closure)
            closure += 1
            if n > room:
                continue
            out.append(frag)
            count += n
        else:
            sym, _ = rng.choice(_CHAIN_ATOMS)
            token = sym
            if sym == "C" and rng.random() < 0.04:
                token = "[CH3+]" if count else "C"
            elif sym == "N" and rng.random() < 0.15:
                token = "[NH3+]" if rng.random() < 0.5 else "[N+](C)(C)C"
            elif sym == "O" and rng.random() < 0.12 and count:
                token = "[O-]"
            if count and rng.random() < 0.30:
                # branch
                out.append("(" + token + ")")
            else:
                # occasional double/triple bond into the chain
                if count and token[0] in "CNO" and rng.random() < 0.15:
                    out.append(rng.choice(["=", "#"]) if token[0] == "C" else "=")
                out.append(token)
            count += token.count("C") + token.count("N") + token.count("O")
            count += sum(token.count(h) for h in ("S", "F", "Br"))
            count += token.count("Cl") * 0  # Cl counted via 'C'? no:
            # crude counting is fine — exactness comes from the parser
        if len(out) > 4 * budget:
            break
    return "".join(out) or "C"


def random_smiles_batch(seed: int, n: int, min_heavy=4, max_heavy=30) -> list[str]:
    """n random parseable SMILES (validated with the Python parser;
    generation retries until each parses)."""
    from nvmolkit_tpu.chem.smiles import mol_from_smiles

    rng = random.Random(seed)
    out = []
    attempts = 0
    while len(out) < n and attempts < 60 * n:
        attempts += 1
        smi = random_smiles(rng, rng.randint(min_heavy, max_heavy))
        try:
            m = mol_from_smiles(smi)
        except Exception:
            continue
        if m.num_atoms >= min_heavy:
            out.append(smi)
    assert len(out) == n, f"generator yield too low: {len(out)}/{n}"
    return out


def random_smiles_with_atoms(seed: int, n_atoms: int, tries: int = 400) -> str:
    """A random SMILES with EXACTLY ``n_atoms`` heavy atoms (grown as a
    carbon chain base + random decoration, then trimmed/extended)."""
    from nvmolkit_tpu.chem.smiles import mol_from_smiles

    rng = random.Random(seed)
    for _ in range(tries):
        smi = random_smiles(rng, n_atoms)
        try:
            m = mol_from_smiles(smi)
        except Exception:
            continue
        if m.num_atoms == n_atoms:
            return smi
        if m.num_atoms < n_atoms:
            # extend with a carbon tail
            smi2 = smi + "C" * (n_atoms - m.num_atoms)
            try:
                if mol_from_smiles(smi2).num_atoms == n_atoms:
                    return smi2
            except Exception:
                continue
    # guaranteed fallback: plain chain
    return "C" * n_atoms
