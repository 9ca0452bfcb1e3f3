"""MMFF94 atom typing + empirical-rule provider + .PAR loader tests.

Typing mirrors the published MMFF94 numeric assignments (paper I Table
III); the rules provider implements paper V's empirical rules; the .PAR
loader is validated against a synthetic format-correct parameter set
(the real distribution files drop in unchanged)."""
import math

import numpy as np
import pytest

from nvmolkit_tpu.chem import mol_from_smiles
from nvmolkit_tpu.models.mmff import (
    EmpiricalMMFFProvider,
    MMFFProperties,
    mmff_atom_types,
)


CASES = {
    # smiles -> expected types (heavy atoms, parse order)
    "CCO": [1, 1, 6],                       # CR CR OR
    "C=C": [2, 2],                          # vinylic
    "C#C": [4, 4],                          # acetylenic
    "CC(=O)C": [1, 3, 7, 1],                # ketone: C=O carbon 3, O 7
    "CC(=O)O": [1, 3, 7, 6],                # acid: carbonyl O 7, hydroxyl O 6
    "CC(=O)[O-]": [1, 3, 32, 32],           # carboxylate: both O type 32
    "CC(=O)NC": [1, 3, 7, 10, 1],           # amide N 10
    "c1ccccc1": [37] * 6,                   # benzene CB
    "c1ccncc1": [37, 37, 37, 38, 37, 37],   # pyridine N 38
    "c1cc[nH]c1": [78, 78, 78, 39, 78],     # pyrrole N 39 in 5-ring
    "c1ccoc1": [78, 78, 78, 59, 78],        # furan O 59
    "c1ccsc1": [78, 78, 78, 44, 78],        # thiophene S 44
    "CN": [1, 8],                           # amine N 8
    "C=N": [3, 9],                          # imine: C=N carbon is type 3
    "CC#N": [1, 4, 42],                     # nitrile N 42
    "Nc1ccccc1": [40, 37, 37, 37, 37, 37, 37],  # aniline N 40
    "C[N+](C)(C)C": [1, 34, 1, 1, 1],       # quaternary N+ 34
    "O=[N+]([O-])C": [32, 45, 35, 1],       # nitro N 45
    "CS": [1, 15],                          # thiol S
    "CS(=O)C": [1, 17, 7, 1],               # sulfoxide S 17
    "CS(=O)(=O)N": [1, 18, 7, 7, 43],       # sulfone S 18, sulfonamide N 43
    "CF": [1, 11],
    "CCl": [1, 12],
    "CBr": [1, 13],
    "CI": [1, 14],
}


@pytest.mark.parametrize("smiles,want", sorted(CASES.items()))
def test_mmff_atom_types(smiles, want):
    m = mol_from_smiles(smiles)
    assert mmff_atom_types(m) == want, smiles


def test_rule_bond_lengths_are_chemical():
    from nvmolkit_tpu.models.mmff.rules import _rule_r0

    m = mol_from_smiles("C=CCO")
    # C=C ~1.33, C-C ~1.50, C-O ~1.42
    r_cc2 = _rule_r0(m, 0, 1, 2.0)
    r_cc1 = _rule_r0(m, 1, 2, 1.0)
    r_co = _rule_r0(m, 2, 3, 1.0)
    assert abs(r_cc2 - 1.33) < 0.08
    assert abs(r_cc1 - 1.51) < 0.06
    assert abs(r_co - 1.42) < 0.06


def test_rule_force_constants_ordering():
    """kb(double) > kb(single); angle ka positive; ethylene V2 ~ 12."""
    from nvmolkit_tpu.models.mmff.rules import EmpiricalMMFFProvider

    prov = EmpiricalMMFFProvider()
    tm = prov.build_terms(mol_from_smiles("C=CC"), MMFFProperties())
    kb = {tuple(sorted(a)): k for a, k in zip(tm.bonds.atoms.tolist(), tm.bonds.params["kb"])}
    assert kb[(0, 1)] > kb[(1, 2)]  # double stiffer than single
    assert (np.asarray(tm.angles.params["ka"]) > 0).all()
    # ethylene-like V2 for the double bond's torsions
    tm2 = prov.build_terms(mol_from_smiles("CC=CC"), MMFFProperties())
    v2 = np.asarray(tm2.torsions.params["v2"])
    assert v2.max() > 8.0  # strong twofold barrier across C=C


def test_rule_charges_polarize_sensibly():
    from nvmolkit_tpu.models.mmff.rules import EmpiricalMMFFProvider

    prov = EmpiricalMMFFProvider()
    m = mol_from_smiles("CCO")
    tm = prov.build_terms(m, MMFFProperties())
    # the 1-4 C...O pair does not exist (3 atoms); check qq sign on C-O:
    # ele pairs exclude 1-2/1-3 so CCO has no ele terms; use butanol
    m2 = mol_from_smiles("CCCCO")
    tm2 = prov.build_terms(m2, MMFFProperties())
    assert tm2.ele.n_terms > 0
    del tm


def test_rules_minimize_to_chemical_geometry():
    """Minimizing with rule parameters reproduces chemical geometry."""
    from nvmolkit_tpu.embedMolecules import EmbedMolecules
    from nvmolkit_tpu.mmffOptimization import MMFFOptimizeMoleculesConfs

    m = mol_from_smiles("CCO")
    EmbedMolecules([m], confsPerMolecule=1, maxIterations=10)
    results, dense = MMFFOptimizeMoleculesConfs(
        [m], maxIters=300, provider=EmpiricalMMFFProvider()
    )
    assert results[0][0][0] == 0  # converged
    pos = np.asarray(dense.positions)[0, 0, : m.num_atoms]
    d_cc = np.linalg.norm(pos[0] - pos[1])
    d_co = np.linalg.norm(pos[1] - pos[2])
    assert abs(d_cc - 1.51) < 0.08
    assert abs(d_co - 1.42) < 0.08
    v1 = pos[0] - pos[1]
    v2 = pos[2] - pos[1]
    ang = math.degrees(
        math.acos(np.dot(v1, v2) / np.linalg.norm(v1) / np.linalg.norm(v2))
    )
    assert 100.0 < ang < 120.0


def test_par_file_provider_overrides_rules(tmp_path):
    """A synthetic .PAR set must override rule-derived parameters."""
    from nvmolkit_tpu.models.mmff.params_files import MMFFParameterFileProvider

    (tmp_path / "MMFFBOND.PAR").write_text(
        "* synthetic test table\n"
        "0   1   1   9.999   1.234\n"   # CR-CR
        "0   1   6   8.888   1.345\n"   # CR-OR
    )
    (tmp_path / "MMFFANG.PAR").write_text(
        "0   1   1   6   7.77   111.1\n"
    )
    (tmp_path / "MMFFVDW.PAR").write_text(
        "1   1.050   2.490   3.890   1.282   -\n"
        "6   0.700   3.150   3.890   1.113   A\n"
    )
    (tmp_path / "MMFFCHG.PAR").write_text(
        "0   1   6   0.3000\n"
        "0   1   1   0.0000\n"
    )
    prov = MMFFParameterFileProvider(tmp_path)
    m = mol_from_smiles("CCO")  # types [1, 1, 6]
    tm = prov.build_terms(m, MMFFProperties())
    kb = dict(zip(map(tuple, tm.bonds.atoms.tolist()), tm.bonds.params["kb"]))
    r0 = dict(zip(map(tuple, tm.bonds.atoms.tolist()), tm.bonds.params["r0"]))
    assert abs(kb[(0, 1)] - 9.999) < 1e-5 and abs(r0[(0, 1)] - 1.234) < 1e-5
    assert abs(kb[(1, 2)] - 8.888) < 1e-5 and abs(r0[(1, 2)] - 1.345) < 1e-5
    ka = tm.angles.params["ka"]
    th = tm.angles.params["theta0"]
    assert abs(float(ka[0]) - 7.77) < 1e-4 and abs(float(th[0]) - 111.1) < 1e-3


def test_par_equivalence_fallback(tmp_path):
    """Missing exact entry falls back via MMFFDEF equivalences."""
    from nvmolkit_tpu.models.mmff.params_files import MMFFParameterTables

    (tmp_path / "MMFFBOND.PAR").write_text("0  1  6  5.55  1.40\n")
    (tmp_path / "MMFFDEF.PAR").write_text(
        "XX  20  1  1  1  0\n"   # type 20 (4-ring CR) falls back to CR=1
    )
    t = MMFFParameterTables(tmp_path)
    assert t.lookup_bond(0, 20, 6) == (5.55, 1.40)
    assert t.lookup_bond(0, 99, 98) is None


def test_default_provider_prefers_par_files(tmp_path, monkeypatch):
    from nvmolkit_tpu.models.mmff.providers import default_provider

    (tmp_path / "MMFFBOND.PAR").write_text("0 1 1 4.0 1.5\n")
    monkeypatch.setenv("NVMOLKIT_MMFF_PARAMS", str(tmp_path))
    prov = default_provider()
    assert type(prov).__name__ == "MMFFParameterFileProvider"
    monkeypatch.delenv("NVMOLKIT_MMFF_PARAMS")
    prov2 = default_provider()
    assert type(prov2).__name__ == "EmpiricalMMFFProvider"


def test_ignore_interfrag_interactions_drops_cross_fragment_pairs():
    """A two-fragment molecule (salt-like '.') must have no cross-
    fragment nonbonded terms under the default, and have them when the
    flag is off (reference forwards the same flag to FF setup)."""
    from nvmolkit_tpu.chem import mol_from_smiles
    from nvmolkit_tpu.chem.mol import fragment_ids
    from nvmolkit_tpu.models.mmff import MMFFProperties
    from nvmolkit_tpu.models.mmff.providers import default_provider
    import numpy as np

    m = mol_from_smiles("CCO.CCN")
    frag = fragment_ids(m)
    assert len(set(frag.tolist())) == 2
    prov = default_provider()

    t_on = prov.build_terms(m, MMFFProperties(ignoreInterfragInteractions=True))
    pairs_on = np.asarray(t_on.vdw.atoms[: t_on.vdw.n_terms])
    assert all(frag[i] == frag[j] for i, j in pairs_on)

    t_off = prov.build_terms(m, MMFFProperties(ignoreInterfragInteractions=False))
    pairs_off = np.asarray(t_off.vdw.atoms[: t_off.vdw.n_terms])
    assert any(frag[i] != frag[j] for i, j in pairs_off)
    assert len(pairs_off) > len(pairs_on)


def test_uff_interfrag_flag():
    from nvmolkit_tpu.chem import mol_from_smiles
    from nvmolkit_tpu.chem.mol import fragment_ids
    from nvmolkit_tpu.models.uff.builder import build_uff_terms
    import numpy as np

    m = mol_from_smiles("CCO.CC")
    frag = fragment_ids(m)
    on = build_uff_terms(m, ignore_interfrag=True)
    off = build_uff_terms(m, ignore_interfrag=False)
    p_on = np.asarray(on.vdw.atoms[: on.vdw.n_terms])
    p_off = np.asarray(off.vdw.atoms[: off.vdw.n_terms])
    assert all(frag[i] == frag[j] for i, j in p_on)
    assert any(frag[i] != frag[j] for i, j in p_off)


def test_par_payload_roundtrip(tmp_path):
    """embed_mmff_par's JSON payload must rebuild identical tables."""
    import gzip
    import json

    from nvmolkit_tpu.models.mmff.params_files import MMFFParameterTables

    (tmp_path / "MMFFBOND.PAR").write_text(
        "0  1  1  9.999  1.234\n0  1  6  8.888  1.345\n"
    )
    (tmp_path / "MMFFANG.PAR").write_text("0  1  1  6  7.77  111.1\n")
    (tmp_path / "MMFFSTBN.PAR").write_text("0  1  1  6  0.21  0.33\n")
    (tmp_path / "MMFFTOR.PAR").write_text("0  1  1  1  6  0.1  0.2  0.3\n")
    (tmp_path / "MMFFOOP.PAR").write_text("1  2  1  6  0.05\n")
    (tmp_path / "MMFFVDW.PAR").write_text(
        "1  1.050  2.490  3.890  1.282  -\n6  0.700  3.150  3.890  1.113  A\n"
    )
    (tmp_path / "MMFFCHG.PAR").write_text("0  1  6  0.3000\n")
    (tmp_path / "MMFFDEF.PAR").write_text("XX  20  1  1  1  0\n")
    t = MMFFParameterTables(tmp_path)

    blob = tmp_path / "payload.json.gz"
    with gzip.open(blob, "wt") as f:
        json.dump(t.to_payload(), f)
    with gzip.open(blob, "rt") as f:
        t2 = MMFFParameterTables.from_payload(json.load(f))

    assert t2.bond == t.bond
    assert t2.angle == t.angle
    assert t2.stbn == t.stbn
    assert t2.tor == t.tor
    assert {tuple(k[0]) + (k[1],) for k in t2.oop} == {
        tuple(k[0]) + (k[1],) for k in t.oop
    }
    assert t2.vdw == {k: tuple(v) for k, v in t.vdw.items()}
    assert t2.chg == t.chg
    assert t2.defaults == t.defaults
    assert t2.lookup_bond(0, 20, 6) == (8.888, 1.345)  # via MMFFDEF fallback
