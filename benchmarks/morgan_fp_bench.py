"""Morgan fingerprint benchmark: featurization, kernel, and end-to-end
(the reference's ``benchmarks/morgan_fp.cpp`` nanobench role)."""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent))
from _common import Timer, emit, make_smiles  # noqa: E402


def main(n_mols: int = 10000, radius: int = 3, fp_size: int = 2048):
    from nvmolkit_tpu.chem.native import morgan_batches_from_smiles, native_available
    from nvmolkit_tpu.fingerprints import MorganFingerprintGenerator

    smiles = make_smiles(n_mols)
    gen = MorganFingerprintGenerator(radius=radius, fpSize=fp_size)

    if native_available():
        with Timer() as t:
            morgan_batches_from_smiles(smiles, (32, 64, 128, 256))
        emit("morgan_featurize", n_mols / t.elapsed, "mols/sec", n=n_mols)

    gen.GetFingerprintsFromSmiles(smiles).numpy()  # compile + warm all shapes
    with Timer() as t:
        gen.GetFingerprintsFromSmiles(smiles).numpy()
    emit("morgan_e2e", n_mols / t.elapsed, "mols/sec", n=n_mols,
         radius=radius, fp_size=fp_size)


if __name__ == "__main__":
    args = sys.argv[1:]
    main(int(args[0]) if args else 10000)
