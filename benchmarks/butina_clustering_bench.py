"""Butina clustering benchmark (matrix and fused modes).

Counterpart of the reference's ``benchmarks/butina_clustering_bench.py``
(modes rdkit/rdkit_lowmem/fused/nvmolkit -> here matrix/fused).
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent))
from _common import Timer, emit, make_smiles  # noqa: E402

import numpy as np  # noqa: E402


def main(n_mols: int = 10000, cutoff: float = 0.6, mode: str = "both"):
    from nvmolkit_tpu.clustering import butina, fused_butina
    from nvmolkit_tpu.fingerprints import MorganFingerprintGenerator
    from nvmolkit_tpu.ops.similarity import cross_similarity

    smiles = make_smiles(n_mols)
    fps = MorganFingerprintGenerator(radius=2, fpSize=2048).GetFingerprintsFromSmiles(
        smiles
    ).jax()

    if mode in ("both", "matrix"):
        sim = cross_similarity(fps, fps)
        dist = 1.0 - sim
        ids = butina(dist, cutoff=cutoff)  # compile
        ids.numpy()
        with Timer() as t:
            ids = butina(dist, cutoff=cutoff)
            ids.numpy()
        n_clusters = int(np.asarray(ids.jax()).max()) + 1
        emit("butina_matrix", n_mols / t.elapsed, "mols/sec", n=n_mols,
             clusters=n_clusters)

    if mode in ("both", "fused"):
        fused_butina(fps, cutoff=cutoff)  # compile
        with Timer() as t:
            clusters, sizes = fused_butina(fps, cutoff=cutoff)
        emit("butina_fused", n_mols / t.elapsed, "mols/sec", n=n_mols,
             clusters=len(clusters))

    if mode == "cpu":
        # host scalar reference (the vs-RDKit comparison mode of the
        # reference's harness, butina_clustering_bench.py mode=rdkit):
        # same hit matrix, numpy implementation
        from nvmolkit_tpu.ops.butina import butina_cpu

        hits = np.asarray(1.0 - cross_similarity(fps, fps)) <= cutoff
        with Timer() as t:
            ids, _, n_clusters = butina_cpu(hits)
        emit("butina_cpu_reference", n_mols / t.elapsed, "mols/sec",
             n=n_mols, clusters=int(n_clusters))


if __name__ == "__main__":
    args = sys.argv[1:]
    main(
        int(args[0]) if args else 10000,
        float(args[1]) if len(args) > 1 else 0.6,
        args[2] if len(args) > 2 else "both",
    )
