"""Round-4: decompose the MMFF energy+grad eval cost by component."""
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


def timeit(fn, reps=20):
    out = fn()
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn()
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / reps)
    return best


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

    def grad_of(f):
        @jax.jit
        def eg(p, b):
            return jax.value_and_grad(lambda q: jnp.sum(f(q, b)))(p)
        return eg

    # nonbonded only
    nb = grad_of(E._nonbonded_dense)
    print(f"nonbonded fwd+grad : {timeit(lambda: nb(posj, batch))*1e3:6.2f} ms")

    # select only (sum of slots as dummy scalar)
    sel = grad_of(lambda p, b: jnp.sum(select_slots(p, b.sel_idx, b.onehot), axis=(0, 2, 3)))
    print(f"select fwd+grad    : {timeit(lambda: sel(posj, batch))*1e3:6.2f} ms")

    # bonded terms only (select + term math, no nonbonded)
    def bonded(p, b):
        slots = select_slots(p, b.sel_idx, b.onehot)
        total = jnp.zeros(p.shape[0], p.dtype)
        for kind, start, count in b.offsets:
            pp = tuple(slots[q, :, :, start : start + count] for q in range(4))
            total = total + jnp.sum(E._BONDED[kind](pp, b.tables[kind]), axis=1)
        return total

    bd = grad_of(bonded)
    print(f"bonded fwd+grad    : {timeit(lambda: bd(posj, batch))*1e3:6.2f} ms")

    # each kind separately
    for kind_sel, _, _ in batch.offsets:
        def one(p, b, ks=kind_sel):
            slots = select_slots(p, b.sel_idx, b.onehot)
            for kind, start, count in b.offsets:
                if kind != ks:
                    continue
                pp = tuple(slots[q, :, :, start : start + count] for q in range(4))
                return jnp.sum(E._BONDED[kind](pp, b.tables[kind]), axis=1)
        g1 = grad_of(one)
        print(f"  select+{kind_sel:14s}: {timeit(lambda: g1(posj, batch))*1e3:6.2f} ms")

    full = grad_of(lambda p, b: E.mmff_energy(p, b))
    print(f"full fwd+grad      : {timeit(lambda: full(posj, batch))*1e3:6.2f} ms")

    # nonbonded forward only
    nbf = jax.jit(E._nonbonded_dense)
    print(f"nonbonded fwd      : {timeit(lambda: nbf(posj, batch))*1e3:6.2f} ms")
    self_sel = jax.jit(lambda p, b: select_slots(p, b.sel_idx, b.onehot))
    print(f"select fwd         : {timeit(lambda: self_sel(posj, batch))*1e3:6.2f} ms")


if __name__ == "__main__":
    main()
