"""TFD + conformer-RMSD matrix benchmark.

Counterpart of the reference's ``benchmarks/tfd_bench.py`` +
``conformer_rmsd_bench.py``: condensed matrices over multi-conformer
ensembles; reports conformer-pairs/sec.
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent))
from _common import Timer, emit, make_smiles  # noqa: E402


def main(n_mols: int = 64, confs: int = 16):
    from nvmolkit_tpu.chem.native import mols_from_smiles
    from nvmolkit_tpu.conformerRmsd import GetConformerRMSMatrixBatch
    from nvmolkit_tpu.embedMolecules import EmbedMolecules
    from nvmolkit_tpu.tfd import GetTFDMatrices

    mols = mols_from_smiles(make_smiles(n_mols))
    EmbedMolecules(mols, confsPerMolecule=confs, maxIterations=10)
    mols = [m for m in mols if len(m.conformers) >= 2]
    n_pairs = sum(
        len(m.conformers) * (len(m.conformers) - 1) // 2 for m in mols
    )

    GetConformerRMSMatrixBatch(mols)  # compile
    with Timer() as t:
        out = GetConformerRMSMatrixBatch(mols)
        [o.numpy() for o in out]
    emit("conformer_rmsd", n_pairs / t.elapsed, "pairs/sec", n_pairs=n_pairs)

    GetTFDMatrices(mols)
    with Timer() as t:
        out = GetTFDMatrices(mols)
        [o.numpy() for o in out]
    emit("tfd_matrix", n_pairs / t.elapsed, "pairs/sec", n_pairs=n_pairs)


if __name__ == "__main__":
    args = sys.argv[1:]
    main(int(args[0]) if args else 64, int(args[1]) if len(args) > 1 else 16)
