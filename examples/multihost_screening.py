"""Example: multi-host (pod-slice) virtual screening.

The same script runs on EVERY host of a TPU pod slice; each host builds
only its own block of library fingerprints, the global similarity
matrix is computed on one mesh spanning all chips (DCN between slices,
ICI within — XLA inserts the collectives), and every host receives the
per-row hit counts. Single-host execution degrades gracefully: the same
code runs on one chip with no coordinator.

Run (single host): python examples/multihost_screening.py
Run (pod):         launch on every host, e.g. with gcloud
                   `--worker=all --command="python .../multihost_screening.py"`
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np
import jax
import jax.numpy as jnp

from nvmolkit_tpu.fingerprints import MorganFingerprintGenerator
from nvmolkit_tpu.chem.native import mols_from_smiles
from nvmolkit_tpu.ops.similarity import cross_similarity
from nvmolkit_tpu.parallel import multihost

LIBRARY = [
    "CCO", "CCN", "CCC", "c1ccccc1", "Cc1ccccc1", "CC(=O)O", "CC(=O)N",
    "c1ccncc1", "CC(C)O", "CCCl", "CCBr", "CC(C)(C)C", "c1ccc2ccccc2c1",
    "CC(=O)Oc1ccccc1C(=O)O", "CN1C=NC2=C1C(=O)N(C)C(=O)N2C", "CCCCCCCC",
] * 16  # 256 molecules
QUERIES = ["CC(=O)Oc1ccccc1C(=O)O", "c1ccc2ccccc2c1"]


def main() -> None:
    distributed = multihost.initialize()
    mesh = multihost.global_mesh()
    n = len(LIBRARY)
    print(
        f"process {jax.process_index()}/{jax.process_count()} "
        f"(distributed={distributed}), {len(jax.devices())} global chips"
    )

    # each host featurizes ONLY its own rows
    start, end = multihost.local_rows(n)
    gen = MorganFingerprintGenerator(radius=3, fpSize=2048)
    local_fps = gen.GetFingerprints(mols_from_smiles(LIBRARY[start:end])).numpy()
    library = multihost.global_array(local_fps, n, mesh)  # row-sharded

    # queries are replicated (tiny)
    query_fps = jnp.asarray(
        gen.GetFingerprints(mols_from_smiles(QUERIES)).numpy()
    )

    @jax.jit
    def screen(lib, q):
        sim = cross_similarity(lib, q, metric="tanimoto")  # [n, nq] row-sharded
        return sim, (sim >= 0.8).sum(axis=1)

    sim, hits = screen(library, query_fps)
    hit_counts = multihost.all_gather_rows(hits)  # every host gets all rows
    hit_rows = np.nonzero(hit_counts > 0)[0]
    print(f"{len(hit_rows)} library molecules within 0.8 Tanimoto of a query")
    for r in hit_rows[:10]:
        print(f"  #{r}: {LIBRARY[r]}")


if __name__ == "__main__":
    main()
