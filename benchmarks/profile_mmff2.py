"""Round-4: time MMFF energy+grad variants to find the cheap exact scheme.

Variants:
  current    — global `highest` precision, Gram-matmul nonbonded, bf16 one-hot select
  diff_nb    — nonbonded r^2 via direct pairwise diffs (VPU, exact, no matmul)
  split_sel  — select via explicit 3-way bf16 split of positions (3 DEFAULT passes)
  both       — diff_nb + split_sel
  fast       — everything DEFAULT precision (speed ceiling, inexact)
"""
from __future__ import annotations

import sys
import time
from functools import partial
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
    S = len(sys_mols)
    A = 32
    pos = np.zeros((S, A, 3), np.float32)
    for i, (m, p) in enumerate(zip(sys_mols, positions)):
        pos[i, : m.num_atoms] = p
    batch = E.make_batched_mmff(sys_mols, A)
    posj = jnp.asarray(pos)

    # ---- variant pieces ----------------------------------------------
    def nonbonded_diff(positions, batch):
        Sl, Al = positions.shape[0], positions.shape[1]
        d = positions[:, :, None, :] - positions[:, None, :, :]
        r2 = jnp.sum(d * d, axis=-1).reshape(Sl, Al * Al)
        r2 = jnp.maximum(r2, 1e-2)
        r = jnp.sqrt(r2)
        rstar = jnp.maximum(batch.nb_rstar, 1e-3)
        ratio = 1.07 * rstar / (r + 0.07 * rstar)
        r7 = r2 ** 3 * r
        rs7 = rstar ** 7
        e_vdw = batch.nb_eps * ratio ** 7 * (1.12 * rs7 / (r7 + 0.12 * rs7) - 2.0)
        rb = r + 0.05
        denom = batch.diel_constant * (rb if batch.diel_model == 1 else rb * rb)
        e_ele = 332.0716 * batch.nb_qq_scale / denom
        return jnp.sum(e_vdw + e_ele, axis=1)

    def split3(x):
        """f32 -> (hi, mid, lo) bf16 triplet summing exactly to x."""
        hi = x.astype(jnp.bfloat16)
        r1 = x - hi.astype(jnp.float32)
        mid = r1.astype(jnp.bfloat16)
        lo = (r1 - mid.astype(jnp.float32)).astype(jnp.bfloat16)
        return hi, mid, lo

    def select_split(positions, onehot):
        hi, mid, lo = split3(positions)
        ein = partial(
            jnp.einsum, "qsta,sad->qsdt",
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT,
        )
        return ein(onehot, hi) + ein(onehot, mid) + ein(onehot, lo)

    def energy_variant(positions, batch, nb="gram", sel="onehot"):
        if nb == "gram":
            total = E._nonbonded_dense(positions, batch)
        else:
            total = nonbonded_diff(positions, batch)
        if sel == "onehot":
            slots = select_slots(positions, batch.sel_idx, batch.onehot)
        else:
            slots = select_split(positions, batch.onehot)
        for kind, start, count in batch.offsets:
            p = tuple(slots[q, :, :, start : start + count] for q in range(4))
            e = E._BONDED[kind](p, batch.tables[kind])
            total = total + jnp.sum(e, axis=1)
        return total

    def make_eg(nb, sel):
        @jax.jit
        def eg(positions, batch):
            def tot(p):
                e = energy_variant(p, batch, nb, sel)
                return jnp.sum(e), e
            (_, e), g = jax.value_and_grad(tot, has_aux=True)(positions)
            return e, jnp.where(batch.atom_mask[..., None], g, 0.0)
        return eg

    base = make_eg("gram", "onehot")
    e0, g0 = base(posj, batch)

    variants = {
        "current": base,
        "diff_nb": make_eg("diff", "onehot"),
        "split_sel": make_eg("gram", "split"),
        "both": make_eg("diff", "split"),
    }
    for name, eg in variants.items():
        t = timeit(lambda eg=eg: eg(posj, batch))
        e, g = eg(posj, batch)
        de = float(jnp.max(jnp.abs(e - e0)))
        dg = float(jnp.max(jnp.abs(g - g0)))
        print(f"{name:10s}: {t*1e3:6.2f} ms/eval  |dE|max={de:.3e} |dG|max={dg:.3e}")

    # speed ceiling: DEFAULT precision everywhere
    with jax.default_matmul_precision("default"):
        fast = make_eg("gram", "onehot")
        t = timeit(lambda: fast(posj, batch))
        print(f"{'fast':10s}: {t*1e3:6.2f} ms/eval  (inexact ceiling)")

    # forward-only for reference
    fwd = jax.jit(lambda p, b: energy_variant(p, b))
    t = timeit(lambda: fwd(posj, batch))
    print(f"{'fwd only':10s}: {t*1e3:6.2f} ms")


if __name__ == "__main__":
    main()
