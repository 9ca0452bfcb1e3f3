"""Round-4: combined best-variant MMFF eval; per-operand precision tests."""
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
    T = batch.sel_idx.shape[1]

    oh = batch.onehot
    oh_m = jnp.transpose(oh, (1, 0, 2, 3)).reshape(S, 4 * T, A)          # bf16
    oh_mf = oh_m.astype(jnp.float32)

    # --- per-operand precision flavors of the flipped dot --------------
    def sel_flip(p, om, prec):
        pT = jnp.transpose(p, (0, 2, 1))
        out = jax.lax.dot_general(
            pT, om,
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
            precision=prec,
        )
        return jnp.transpose(out.reshape(S, 3, 4, T), (2, 0, 1, 3))

    P = jax.lax.Precision
    ref = None
    for name, om, prec in [
        ("f32xf32 HIGHEST", oh_mf, P.HIGHEST),
        ("f32xbf16 HIGHEST", oh_m, P.HIGHEST),
        ("f32xbf16 (HI,DEF)", oh_m, (P.HIGHEST, P.DEFAULT)),
        ("f32xbf16 DEFAULT", oh_m, P.DEFAULT),
        ("f32xf32 HIGH", oh_mf, P.HIGH),
    ]:
        f = jax.jit(lambda p, o, prec=prec: sel_flip(p, o, prec))
        out = f(posj, om)
        if ref is None:
            ref = out
        d = float(jnp.max(jnp.abs(out - ref)))
        g = jax.jit(jax.grad(lambda p, o, f=f: jnp.sum(f(p, o))))
        print(f"sel flip {name:18s}: fwd {timeit(lambda: f(posj, om))*1e3:5.2f} ms  "
              f"grad {timeit(lambda: g(posj, om))*1e3:5.2f} ms  maxdiff={d:.2e}")

    # --- combined full eval: flipped select + coord-diff nonbonded -----
    def nb_core(r2, rs, ep, qq):
        r2 = jnp.maximum(r2.reshape(S, A * A), 1e-2)
        r = jnp.sqrt(r2)
        rstar = jnp.maximum(rs, 1e-3)
        ratio = 1.07 * rstar / (r + 0.07 * rstar)
        r7 = r2 ** 3 * r
        rs7 = rstar ** 7
        e_vdw = ep * ratio ** 7 * (1.12 * rs7 / (r7 + 0.12 * rs7) - 2.0)
        rb = r + 0.05
        e_ele = 332.0716 * qq / (batch.diel_constant * rb)
        return jnp.sum(e_vdw + e_ele, axis=1)

    def full(p, om, rs, ep, qq, tables):
        pT = jnp.transpose(p, (0, 2, 1))
        d = pT[:, :, :, None] - pT[:, :, None, :]
        total = nb_core(jnp.sum(d * d, axis=1), rs, ep, qq)
        slots = sel_flip(p, om, (P.HIGHEST, P.DEFAULT))
        for kind, start, count in batch.offsets:
            pp = tuple(slots[q, :, :, start : start + count] for q in range(4))
            e = E._BONDED[kind](pp, tables[kind])
            total = total + jnp.sum(e, axis=1)
        return total

    @jax.jit
    def eg(p, om, rs, ep, qq, tables):
        def tot(q):
            e = full(q, om, rs, ep, qq, tables)
            return jnp.sum(e), e
        (_, e), g = jax.value_and_grad(tot, has_aux=True)(p)
        return e, g

    args = (oh_m, batch.nb_rstar, batch.nb_eps, batch.nb_qq_scale, batch.tables)
    e_new, g_new = eg(posj, *args)
    e_old, g_old = E.mmff_energy_and_grad(posj, batch)
    fin = jnp.isfinite(g_old).all(axis=(1, 2)) & jnp.isfinite(e_old)
    de = float(jnp.max(jnp.abs(jnp.where(fin, e_new - e_old, 0.0))))
    dg = float(jnp.max(jnp.abs(jnp.where(fin[:, None, None], g_new - g_old, 0.0))))
    print(f"combined eval: {timeit(lambda: eg(posj, *args))*1e3:5.2f} ms  "
          f"(old {timeit(lambda: E.mmff_energy_and_grad(posj, batch))*1e3:5.2f} ms)  "
          f"dE={de:.2e} dG={dg:.2e}  nonfinite={int((~fin).sum())}")


if __name__ == "__main__":
    main()
