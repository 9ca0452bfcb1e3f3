"""Experimental-torsion preferences for ETKDG (embedded core library).

ETKDG's defining feature is a SMARTS-pattern-driven torsion-preference
library (Riniker & Landrum 2015, building on the Schaerfer et al.
torsion library; the reference consumes it via RDKit's CrystalFF,
``src/forcefields/dist_geom.h:73-80``). Each rule is a 4-atom SMARTS
whose middle two atoms define the central bond plus a Fourier series
E = sum_k F_k (1 + cos(k*phi - phi0_k)).

This module embeds a CORE rule set covering the most common torsion
classes in drug-like molecules (amide/ester planarity, conjugation,
heteroatom-linked rotors, glycol gauche, disulfides, generic sp3
staggering), matched with the library's own SMARTS engine. Rules are
ordered most-specific-first; the FIRST rule matching a central bond
wins, mirroring the published library's hierarchy. A full published
torsion-library file can be loaded over it with
:func:`load_torsion_rules` (same rule format).

sp2-sp2 central bonds are skipped here: the basic-knowledge stage
(:mod:`nvmolkit_tpu.models.etk`) already pins those planar.
"""
from __future__ import annotations

import dataclasses
import math

import numpy as np

from nvmolkit_tpu.chem.mol import Mol


@dataclasses.dataclass(frozen=True)
class TorsionRule:
    smarts: str
    # (k, F_k, phi0_k degrees) triples
    terms: tuple[tuple[int, float, float], ...]


# Core rules, most specific first. F in kcal/mol; phi0 in degrees.
# Minima of F(1 + cos(k phi - phi0)): phi = (phi0 + 180)/k + n*360/k.
CORE_TORSION_RULES: tuple[TorsionRule, ...] = (
    # amide: planar, trans-preferring
    TorsionRule("[O]=[CX3][NX3][*]", ((2, 6.0, 180.0),)),
    # ester / carboxylic acid C(=O)-O: planar (Z preference)
    TorsionRule("[O]=[CX3][OX2][*]", ((2, 4.5, 180.0),)),
    # amidine / guanidine C-N
    TorsionRule("[NX2]=[CX3][NX3][*]", ((2, 5.0, 180.0),)),
    # sulfonamide S-N: staggered threefold
    TorsionRule("[*][SX4][NX3][*]", ((3, 0.6, 0.0),)),
    # disulfide: +/-90 minima
    TorsionRule("[*][SX2][SX2][*]", ((2, 3.5, 0.0),)),
    # glycol / diol O-C-C-O: gauche preference
    TorsionRule("[OX2][CX4][CX4][OX2]", ((2, 0.5, 0.0), (3, 0.9, 0.0))),
    # halogenated ethane F/Cl-C-C-F/Cl: gauche-ish
    TorsionRule("[F,Cl][CX4][CX4][F,Cl]", ((3, 0.8, 0.0),)),
    # anomeric-ish O-C-O linkage
    TorsionRule("[OX2][CX4][OX2][*]", ((2, 0.8, 0.0), (3, 0.9, 0.0))),
    # aromatic-O ether (anisole): planar
    TorsionRule("[c][c][OX2][CX4]", ((2, 1.8, 180.0),)),
    # aromatic-N (aniline-like rotor around c-N)
    TorsionRule("[c][c][NX3][*]", ((2, 1.2, 180.0),)),
    # benzylic c-C(sp3): low sixfold
    TorsionRule("[c][c][CX4][*]", ((6, 0.15, 180.0),)),
    # ether C-O rotor
    TorsionRule("[*][CX4][OX2][*]", ((3, 0.7, 0.0),)),
    # amine C-N rotor
    TorsionRule("[*][CX4][NX3][*]", ((3, 0.7, 0.0),)),
    # thioether C-S rotor
    TorsionRule("[*][CX4][SX2][*]", ((3, 0.6, 0.0),)),
    # generic sp3-sp3: staggered threefold
    TorsionRule("[*][CX4][CX4][*]", ((3, 0.6, 0.0),)),
)


def load_torsion_rules(path) -> tuple[TorsionRule, ...]:
    """Load rules from a text file: ``SMARTS k1 F1 phi1 [k2 F2 phi2 ...]``
    per line, '#' comments. The published torsion-library files convert
    to this format line-for-line."""
    rules = []
    for line in open(path):
        line = line.strip()
        if not line or line.startswith("#"):
            continue
        parts = line.split()
        smarts = parts[0]
        vals = [float(x) for x in parts[1:]]
        terms = tuple(
            (int(vals[i]), vals[i + 1], vals[i + 2])
            for i in range(0, len(vals), 3)
        )
        rules.append(TorsionRule(smarts, terms))
    return tuple(rules)


class ExperimentalTorsionProvider:
    """Default ETKDG torsion-preference provider: SMARTS-rule matching
    over the embedded (or loaded) library, first rule per central bond
    wins. Callable with a Mol; returns (idx [T,4], coeffs [T,6],
    phase [T,6] radians) per the build_etk_terms contract."""

    def __init__(self, rules: tuple[TorsionRule, ...] = CORE_TORSION_RULES):
        from nvmolkit_tpu.chem.smarts import parse_smarts

        self.rules = rules
        self._queries = [parse_smarts(r.smarts) for r in rules]

    def __call__(self, mol: Mol):
        from nvmolkit_tpu.models.uff.builder import _hybridization
        from nvmolkit_tpu.ops.substruct import featurize_target, find_matches

        tf = featurize_target(mol)
        claimed: set[tuple[int, int]] = set()
        idx_rows, coeff_rows, phase_rows = [], [], []
        for rule, query in zip(self.rules, self._queries):
            matches, _ = find_matches(query, tf, max_matches=256, uniquify=False)
            for row in matches:
                i, j, k, l = (int(x) for x in row[:4])
                bond = (min(j, k), max(j, k))
                if bond in claimed:
                    continue
                b = mol.bond_between(j, k)
                if b is None or b.in_ring:
                    continue  # ring torsions are bounds-driven
                if _hybridization(mol, j) == 2 and _hybridization(mol, k) == 2:
                    continue  # planarity handled by the basic-knowledge stage
                claimed.add(bond)
                coeffs = np.zeros(6, np.float32)
                phase = np.zeros(6, np.float32)
                for kk, f, phi0 in rule.terms:
                    coeffs[kk - 1] = f
                    phase[kk - 1] = math.radians(phi0)
                idx_rows.append((i, j, k, l))
                coeff_rows.append(coeffs)
                phase_rows.append(phase)
        if not idx_rows:
            return (
                np.zeros((0, 4), np.int32),
                np.zeros((0, 6), np.float32),
                np.zeros((0, 6), np.float32),
            )
        return (
            np.asarray(idx_rows, np.int32),
            np.stack(coeff_rows),
            np.stack(phase_rows),
        )


_default: ExperimentalTorsionProvider | None = None


def default_torsion_provider() -> ExperimentalTorsionProvider:
    global _default
    if _default is None:
        _default = ExperimentalTorsionProvider()
    return _default
