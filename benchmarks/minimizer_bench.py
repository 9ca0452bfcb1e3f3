"""Raw minimizer-kernel benchmark across backends (the reference's
``updateInverseHessianBench.cu`` + ``mmff_multimol_bench.cpp`` roles)."""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent))
from _common import emit, make_smiles  # noqa: E402

import numpy as np  # noqa: E402


def main(n_mols: int = 512, confs: int = 4, max_iters: int = 200):
    import jax.numpy as jnp

    from nvmolkit_tpu.chem.native import mols_from_smiles
    from nvmolkit_tpu.embedMolecules import EmbedMolecules
    from nvmolkit_tpu.models.mmff import MMFFProperties, make_batched_mmff, mmff_energy_and_grad
    from nvmolkit_tpu.models.terms import expand_batch_to_systems
    from nvmolkit_tpu.ops.minimize_driver import BACKENDS

    mols = mols_from_smiles(make_smiles(n_mols))
    EmbedMolecules(mols, confsPerMolecule=confs, maxIterations=8)
    mols = [m for m in mols if m.conformers]
    systems, sys2mol = [], []
    for mi, m in enumerate(mols):
        for c in m.conformers:
            systems.append((m, c))
            sys2mol.append(mi)
    S = len(systems)
    A = 32
    ubatch = make_batched_mmff(mols, A, MMFFProperties())
    batch = expand_batch_to_systems(ubatch, np.asarray(sys2mol), S)
    pos0 = np.zeros((S, A, 3), np.float32)
    for k, (m, c) in enumerate(systems):
        pos0[k, : m.num_atoms] = c
    pos0 = jnp.asarray(pos0)

    for name, minimize in BACKENDS.items():
        # sync via scalar fetch: block_until_ready does not synchronize
        # under the axon tunnel (repo timing rule, ROUND2_NOTES)
        r = minimize(mmff_energy_and_grad, pos0, batch.atom_mask,
                     max_iters=max_iters, energy_args=batch)
        float(jnp.sum(r.positions))
        t0 = time.perf_counter()
        r = minimize(mmff_energy_and_grad, pos0, batch.atom_mask,
                     max_iters=max_iters, energy_args=batch)
        float(jnp.sum(r.positions))
        dt = time.perf_counter() - t0
        conv = float(jnp.mean(r.converged.astype(jnp.float32)))
        emit(f"minimize_kernel_{name}", S / dt, "minimizations/sec",
             n_systems=S, converged_frac=conv, steps=int(r.n_iters))


if __name__ == "__main__":
    args = sys.argv[1:]
    main(int(args[0]) if args else 512)
