"""Round-4: in-loop per-step cost of MMFF eval components (fori_loop harness).

Each component eval runs inside a 200-step fori_loop with a tiny
position update, so the measurement matches the minimizer's regime
(no per-step dispatch, XLA loop-level optimization).
"""
from __future__ import annotations

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from _common import make_smiles

N_STEPS = 200


def per_step(fn, posj, args, reps=3):
    @jax.jit
    def run(p, a):
        def body(i, q):
            e, g = fn(q, a)
            return q - 1e-9 * g
        return jax.lax.fori_loop(0, N_STEPS, body, p)

    out = run(posj, args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = run(posj, args)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return best / N_STEPS


def main():
    from nvmolkit_tpu.chem.native import mols_from_smiles
    from nvmolkit_tpu.embedMolecules import EmbedMolecules
    from nvmolkit_tpu.models.mmff import energy as E
    from nvmolkit_tpu.models.terms import select_slots

    mols = mols_from_smiles(make_smiles(1024))
    EmbedMolecules(mols, confsPerMolecule=8, maxIterations=8)
    mols = [m for m in mols if m.conformers]
    sys_mols, positions = [], []
    for m in mols:
        for c in m.conformers:
            sys_mols.append(m)
            positions.append(np.asarray(c))
    S, A = len(sys_mols), 32
    pos = np.zeros((S, A, 3), np.float32)
    for i, (m, p) in enumerate(zip(sys_mols, positions)):
        pos[i, : m.num_atoms] = p
    batch = E.make_batched_mmff(sys_mols, A)
    posj = jnp.asarray(pos)

    def eg_of(f):
        def eg(p, b):
            e, g = jax.value_and_grad(lambda q: jnp.sum(f(q, b)))(p)
            return e, g
        return eg

    def sel_only(p, b):
        return jnp.sum(select_slots(p, b.sel_idx, b.onehot), axis=(0, 2, 3))

    def bonded_only(p, b):
        slots = select_slots(p, b.sel_idx, b.onehot)
        total = jnp.zeros(p.shape[0], p.dtype)
        for kind, start, count in b.offsets:
            pp = tuple(slots[q, :, :, start : start + count] for q in range(4))
            total = total + jnp.sum(E._BONDED[kind](pp, b.tables[kind]), axis=1)
        return total

    def null_e(p, b):
        return jnp.sum(p * p, axis=(1, 2))

    print(f"loop overhead (null eval): {per_step(eg_of(null_e), posj, batch)*1e3:5.2f} ms/step")
    print(f"nonbonded only           : {per_step(eg_of(E._nonbonded_dense), posj, batch)*1e3:5.2f} ms/step")
    print(f"select only              : {per_step(eg_of(sel_only), posj, batch)*1e3:5.2f} ms/step")
    print(f"select+bonded            : {per_step(eg_of(bonded_only), posj, batch)*1e3:5.2f} ms/step")
    print(f"full energy              : {per_step(eg_of(E.mmff_energy), posj, batch)*1e3:5.2f} ms/step")
    print(f"full via mmff_e_and_g    : {per_step(E.mmff_energy_and_grad, posj, batch)*1e3:5.2f} ms/step")


if __name__ == "__main__":
    main()
