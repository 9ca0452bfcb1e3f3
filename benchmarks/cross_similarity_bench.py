"""Cross Tanimoto/cosine similarity benchmark.

Counterpart of the reference's ``benchmarks/cross_similarity_bench.py``:
FP -> NxN similarity over a 10K-molecule set; reports pairs/sec.
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent))
from _common import Timer, emit, make_smiles  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def main(n_mols: int = 10000, fp_size: int = 2048, radius: int = 3):
    from nvmolkit_tpu.fingerprints import MorganFingerprintGenerator
    from nvmolkit_tpu.ops.similarity import cross_similarity

    smiles = make_smiles(n_mols)
    gen = MorganFingerprintGenerator(radius=radius, fpSize=fp_size)
    gen.GetFingerprintsFromSmiles(smiles).numpy()  # compile at full shapes
    with Timer() as t_fp:
        fps = gen.GetFingerprintsFromSmiles(smiles)
        fps.numpy()
        fps = fps.jax()
    emit("morgan_fp_e2e", n_mols / t_fp.elapsed, "mols/sec", n=n_mols)

    @jax.jit
    def checksum(a, b):
        return jnp.sum(cross_similarity(a, b))

    float(checksum(fps, fps))  # compile
    reps = 10
    t0 = time.perf_counter()
    vals = [checksum(fps, fps) for _ in range(reps)]
    float(vals[-1])
    dt = time.perf_counter() - t0
    emit(
        "tanimoto_cross_similarity",
        n_mols * n_mols * reps / dt,
        "pairs/sec",
        baseline=1e9,
        n=n_mols,
        fp_size=fp_size,
    )


if __name__ == "__main__":
    main(*(int(a) for a in sys.argv[1:]))
