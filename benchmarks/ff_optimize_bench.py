"""Batch force-field minimization benchmark (UFF / MMFF).

Counterpart of the reference's ``benchmarks/ff_optimize_bench.py``
(``--ff mmff|uff``); target: >= 5000 minimizations/sec (BASELINE.md).
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent))
from _common import emit, make_smiles  # noqa: E402
from _timing import time_it  # noqa: E402

import numpy as np  # noqa: E402


def main(ff: str = "uff", n_mols: int = 512, confs: int = 4, max_iters: int = 200):
    from nvmolkit_tpu.chem.native import mols_from_smiles
    from nvmolkit_tpu.embedMolecules import EmbedMolecules
    from nvmolkit_tpu.types import CoordinateOutput

    smiles = make_smiles(n_mols)
    mols = mols_from_smiles(smiles)
    EmbedMolecules(mols, confsPerMolecule=confs, maxIterations=8)
    mols = [m for m in mols if m.conformers]
    n_systems = sum(len(m.conformers) for m in mols)

    if ff == "uff":
        from nvmolkit_tpu.uffOptimization import UFFOptimizeMoleculesConfs as opt
    elif ff == "mmff":
        from nvmolkit_tpu.mmffOptimization import MMFFOptimizeMoleculesConfs as opt
    else:
        raise SystemExit(f"unknown ff {ff}")

    # DEVICE output: the default CONFORMERS writeback would make every
    # run after the first start at the minimum (near-instant via the
    # zero-gradient entry test) and report a fantasy number
    dense_box = []

    def run():
        dense_box.clear()
        dense_box.append(
            opt(mols, maxIters=max_iters, output=CoordinateOutput.DEVICE)
        )
        return dense_box[0]

    timing = time_it(run, runs=3, warmups=1)
    dense = dense_box[0]
    conv = np.asarray(dense.converged)[np.asarray(dense.conf_mask)]
    emit(
        f"{ff}_minimizations",
        n_systems / timing.best_s,
        "minimizations/sec",
        baseline=5000.0,
        n_systems=n_systems,
        converged_frac=float(conv.mean()) if conv.size else 0.0,
        max_iters=max_iters,
        **timing.stats(),
    )


if __name__ == "__main__":
    args = sys.argv[1:]
    main(
        args[0] if args else "uff",
        int(args[1]) if len(args) > 1 else 512,
        int(args[2]) if len(args) > 2 else 4,
        int(args[3]) if len(args) > 3 else 200,
    )
