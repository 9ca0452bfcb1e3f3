"""ETKDG embedding benchmark.

Counterpart of the reference's ``benchmarks/etkdg_bench.py``: conformers
generated per second over a molecule set.
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent))
from _common import Timer, emit, make_smiles  # noqa: E402

import numpy as np  # noqa: E402


def main(n_mols: int = 256, confs: int = 4):
    from nvmolkit_tpu.chem.native import mols_from_smiles
    from nvmolkit_tpu.embedMolecules import EmbedMolecules

    smiles = make_smiles(n_mols)
    mols = mols_from_smiles(smiles)
    # warm-up/compile on a copy
    warm = mols_from_smiles(smiles)
    EmbedMolecules(warm, confsPerMolecule=confs, maxIterations=4)

    with Timer() as t:
        res = EmbedMolecules(mols, confsPerMolecule=confs, maxIterations=8)
    produced = int(np.asarray(res.conf_mask).sum())
    emit(
        "etkdg_embedding",
        produced / t.elapsed,
        "conformers/sec",
        n_mols=n_mols,
        requested=n_mols * confs,
        produced=produced,
    )


if __name__ == "__main__":
    args = sys.argv[1:]
    main(int(args[0]) if args else 256, int(args[1]) if len(args) > 1 else 4)
