"""Example: conformer generation -> minimization -> diversity analysis.

SMILES -> ETKDG embedding -> UFF minimization -> pairwise RMSD + TFD ->
Butina clustering of conformers. The end-to-end device-resident chain
the reference builds with Device3DResult handoffs.

Run: python examples/conformer_pipeline.py
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np

from nvmolkit_tpu.chem.native import mols_from_smiles
from nvmolkit_tpu.clustering import butina
from nvmolkit_tpu.conformerRmsd import GetConformerRMSMatrix
from nvmolkit_tpu.embedMolecules import EmbedMolecules, EmbedParameters
from nvmolkit_tpu.tfd import GetTFDMatrix
from nvmolkit_tpu.uffOptimization import UFFOptimizeMoleculesConfs


def main():
    mols = mols_from_smiles(["CC(C)Cc1ccc(cc1)C(C)C(=O)O"])  # ibuprofen
    mol = mols[0]

    EmbedMolecules(mols, confsPerMolecule=12, maxIterations=15,
                   params=EmbedParameters(pruneRmsThresh=0.15))
    print(f"embedded {len(mol.conformers)} conformers")

    results, dense = UFFOptimizeMoleculesConfs(mols, maxIters=300)
    energies = [e for _, e in results[0]]
    print(f"UFF energies: {[round(e, 2) for e in energies]}")
    # write minimized coordinates back for the analysis steps
    for ci, conf in enumerate(dense.per_molecule()[0]):
        mol.conformers[ci] = conf.astype(np.float64)

    if len(mol.conformers) >= 2:
        rms = GetConformerRMSMatrix(mol).numpy()
        tfd = GetTFDMatrix(mol).numpy()
        print(f"RMSD range: {rms.min():.2f} - {rms.max():.2f} A")
        print(f"TFD  range: {tfd.min():.3f} - {tfd.max():.3f}")

        n = len(mol.conformers)
        dist = np.zeros((n, n))
        p = 0
        for i in range(1, n):
            for j in range(i):
                dist[i, j] = dist[j, i] = rms[p]
                p += 1
        ids = butina(dist, cutoff=1.0).numpy()
        print(f"conformer clusters at 1.0 A: {int(ids.max()) + 1}")


if __name__ == "__main__":
    main()
