"""Device-resident conformer pipeline: embed -> MMFF -> TFD/RMSD -> butina.

Coordinates never round-trip through host conformer lists between
stages — every stage reads the previous stage's Dense3DResult in device
memory via ``positionsFrom`` (the reference's device-input chain,
``src/conformer/ff_device_collect.h:64-97``). Only the final condensed
matrices and cluster labels come back to the host.

Run: python examples/conformer_pipeline.py [n_mols]
"""
import sys
import time

import numpy as np

from nvmolkit_tpu.chem import mol_from_smiles
from nvmolkit_tpu.clustering import butina
from nvmolkit_tpu.conformerRmsd import GetConformerRMSMatrixBatch
from nvmolkit_tpu.embedMolecules import EmbedMolecules
from nvmolkit_tpu.mmffOptimization import MMFFOptimizeMoleculesConfs
from nvmolkit_tpu.tfd import GetTFDMatrices
from nvmolkit_tpu.types import CoordinateOutput

SMILES = [
    "CCCCOC(=O)c1ccccc1",
    "CCCNC(=O)CC",
    "CC(C)CC(=O)NCc1ccccc1",
    "CCOC(=O)CCN(C)C",
    "c1ccc(-c2ccccc2)cc1",
    "COc1ccc(CC(=O)NC)cc1",
]


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else len(SMILES)
    mols = [mol_from_smiles(SMILES[i % len(SMILES)]) for i in range(n)]

    t0 = time.perf_counter()
    embedded = EmbedMolecules(mols, confsPerMolecule=8, maxIterations=10)
    print(f"embed: {time.perf_counter() - t0:.2f}s "
          f"({int(np.asarray(embedded.conf_mask).sum())} conformers)")

    t0 = time.perf_counter()
    minimized = MMFFOptimizeMoleculesConfs(
        mols, maxIters=100,
        positionsFrom=embedded,            # device-resident chain
        output=CoordinateOutput.DEVICE,    # stay on device
    )
    conv = float(np.asarray(minimized.converged).mean())
    print(f"mmff:  {time.perf_counter() - t0:.2f}s (converged {conv:.0%})")

    t0 = time.perf_counter()
    rms = GetConformerRMSMatrixBatch(mols, positionsFrom=minimized)
    tfd = GetTFDMatrices(mols, positionsFrom=minimized)
    print(f"rmsd+tfd: {time.perf_counter() - t0:.2f}s")

    for m, r, t in zip(mols[:3], rms, tfd):
        c = len(m.conformers)
        sq = np.zeros((c, c), np.float32)
        tri = np.tril_indices(c, k=-1)
        v = r.numpy()
        sq[tri] = v
        sq[tri[1], tri[0]] = v
        labels = np.asarray(butina(sq, 1.0).numpy())
        print(f"  {c} confs -> {labels.max() + 1} clusters; "
              f"median RMSD {np.median(v):.2f} A, "
              f"median TFD {np.median(t.numpy()):.3f}")


if __name__ == "__main__":
    main()
