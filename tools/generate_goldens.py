#!/usr/bin/env python
"""Generate RDKit golden fixtures for the differential test suite.

Run this ON A MACHINE WITH RDKIT INSTALLED (any platform; no TPU or
JAX needed) and commit the resulting ``tests/golden/rdkit_*.json``
files. The CI image has no RDKit, so the parity tests in
``tests/test_golden.py`` skip until these files exist — committing them
converts every "matches my own oracle" claim into "matches RDKit"
(the reference's universal test strategy, SURVEY.md section 4).

    python tools/generate_goldens.py [--out tests/golden]

Produces:
  rdkit_morgan.json       Morgan bits: r in {2,3} x fpSize in {1024,2048}
                          x chirality on/off, per fixture SMILES
  rdkit_perception.json   aromaticity flags, implicit H counts, ring
                          membership, SSSR sizes per fixture SMILES
  rdkit_mmff.json         MMFF94 energies (total + per-term) on fixed
                          seeded ETKDG conformers, coordinates included
  rdkit_tfd.json          GetTFDMatrix values on multi-conformer sets
  rdkit_substruct.json    GetSubstructMatches sets for the SMARTS panel
  rdkit_butina.json       Butina.ClusterData clusters on fixture FPs
"""
from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

from tests.data.smiles import SMILES_100  # noqa: E402

SMARTS_PANEL = [
    "c1ccccc1", "[CX3](=O)[OX2H1]", "[CX3](=O)[NX3]", "[OX2H1]",
    "[NX3;!$(NC=O)]", "C(F)(F)F", "[R1]", "[R2]", "[r6]", "[x2]",
    "c1ccncc1", "[#6;!R]", "[SX2]", "O=C", "[!#6;!#1]",
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=str(REPO / "tests" / "golden"))
    args = ap.parse_args()
    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)

    from rdkit import Chem
    from rdkit.Chem import AllChem
    from rdkit.Chem import TorsionFingerprints
    from rdkit.ML.Cluster import Butina
    from rdkit import DataStructs

    mols = [Chem.MolFromSmiles(s) for s in SMILES_100]

    # --- Morgan bits -------------------------------------------------
    morgan = {}
    for radius in (2, 3):
        for fp_size in (1024, 2048):
            for chiral in (False, True):
                key = f"r{radius}_n{fp_size}_c{int(chiral)}"
                gen = AllChem.GetMorganGenerator(
                    radius=radius, fpSize=fp_size, includeChirality=chiral
                )
                morgan[key] = [
                    sorted(gen.GetFingerprint(m).GetOnBits()) for m in mols
                ]
    (out / "rdkit_morgan.json").write_text(
        json.dumps({"smiles": SMILES_100, "bits": morgan})
    )

    # --- perception ---------------------------------------------------
    perception = []
    for m in mols:
        ri = m.GetRingInfo()
        perception.append(
            {
                "aromatic": [a.GetIsAromatic() for a in m.GetAtoms()],
                "implicit_hs": [a.GetTotalNumHs() for a in m.GetAtoms()],
                "in_ring": [a.IsInRing() for a in m.GetAtoms()],
                "sssr_sizes": sorted(len(r) for r in ri.AtomRings()),
            }
        )
    (out / "rdkit_perception.json").write_text(
        json.dumps({"smiles": SMILES_100, "perception": perception})
    )

    # --- MMFF energies on seeded conformers ----------------------------
    mmff = []
    for smi in SMILES_100[:40]:
        m = Chem.AddHs(Chem.MolFromSmiles(smi))
        ps = AllChem.ETKDGv3()
        ps.randomSeed = 42
        if AllChem.EmbedMolecule(m, ps) != 0:
            continue
        props = AllChem.MMFFGetMoleculeProperties(m)
        if props is None:
            continue
        ff = AllChem.MMFFGetMoleculeForceField(m, props)
        conf = m.GetConformer()
        mmff.append(
            {
                "smiles": smi,
                "coords": [list(conf.GetAtomPosition(i)) for i in range(m.GetNumAtoms())],
                "elements": [a.GetAtomicNum() for a in m.GetAtoms()],
                "energy": ff.CalcEnergy(),
            }
        )
    (out / "rdkit_mmff.json").write_text(json.dumps({"entries": mmff}))

    # --- TFD -----------------------------------------------------------
    tfd = []
    for smi in SMILES_100[:20]:
        m = Chem.AddHs(Chem.MolFromSmiles(smi))
        ps = AllChem.ETKDGv3()
        ps.randomSeed = 7
        if len(AllChem.EmbedMultipleConfs(m, 4, ps)) < 2:
            continue
        try:
            vals = TorsionFingerprints.GetTFDMatrix(m)
        except Exception:
            continue
        m_noh = Chem.RemoveHs(m)
        confs = [
            [list(c.GetAtomPosition(i)) for i in range(m_noh.GetNumAtoms())]
            for c in m_noh.GetConformers()
        ]
        tfd.append({"smiles": smi, "confs": confs, "tfd": list(vals)})
    (out / "rdkit_tfd.json").write_text(json.dumps({"entries": tfd}))

    # --- substructure ----------------------------------------------------
    sub = []
    for smi in SMILES_100:
        m = Chem.MolFromSmiles(smi)
        row = {}
        for q in SMARTS_PANEL:
            patt = Chem.MolFromSmarts(q)
            row[q] = sorted(
                sorted(match) for match in m.GetSubstructMatches(patt, uniquify=True)
            )
        sub.append({"smiles": smi, "matches": row})
    (out / "rdkit_substruct.json").write_text(
        json.dumps({"smarts": SMARTS_PANEL, "entries": sub})
    )

    # --- Butina ----------------------------------------------------------
    gen = AllChem.GetMorganGenerator(radius=2, fpSize=1024)
    fps = [gen.GetFingerprint(m) for m in mols]
    dists = []
    for i in range(1, len(fps)):
        sims = DataStructs.BulkTanimotoSimilarity(fps[i], fps[:i])
        dists.extend(1.0 - s for s in sims)
    clusters = Butina.ClusterData(dists, len(fps), 0.6, isDistData=True)
    (out / "rdkit_butina.json").write_text(
        json.dumps(
            {
                "smiles": SMILES_100,
                "cutoff": 0.6,
                "clusters": [sorted(c) for c in clusters],
            }
        )
    )
    print(f"goldens written to {out}")


if __name__ == "__main__":
    main()
