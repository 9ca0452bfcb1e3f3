"""Round-4: micro-variants for the two hot MMFF components.

select: [4,S,T,A] one-hot x [S,A,3] -> [4,S,3,T]
nonbonded: pairwise r^2 over [S,A,3]

All variants are timed forward-only and fwd+grad, checked for exactness
against the current implementation. Device arrays are passed as jit
ARGUMENTS (closure constants get shipped to the remote compiler).
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
    T = batch.sel_idx.shape[1]
    print(f"S={S} A={A} T={T}")

    oh = batch.onehot                      # [4, S, T, A] bf16
    oh_m = jnp.transpose(oh, (1, 0, 2, 3)).reshape(S, 4 * T, A)
    idx_flat = jnp.transpose(batch.sel_idx, (0, 2, 1)).reshape(S, 4 * T)  # [S,4T]

    ref = select_slots(posj, batch.sel_idx, oh)  # [4,S,3,T]

    def check(out):
        d = float(jnp.max(jnp.abs(out.astype(jnp.float32) - ref)))
        return f"maxdiff={d:.2e}"

    # V1: current
    f1 = jax.jit(lambda p, o: select_slots(p, None, o))
    print(f"sel current einsum      : {timeit(lambda: f1(posj, oh))*1e3:6.2f} ms")

    # V2: flipped dot: [S,3,A] @ [S,A,4T] -> [S,3,4T]
    @jax.jit
    def f2(p, om):
        pT = jnp.transpose(p, (0, 2, 1))  # [S,3,A]
        out = jax.lax.dot_general(
            pT, om.astype(jnp.float32),
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # [S, 3, 4T]
        return jnp.transpose(out.reshape(S, 3, 4, T), (2, 0, 1, 3))
    print(f"sel flipped dot f32     : {timeit(lambda: f2(posj, oh_m))*1e3:6.2f} ms  {check(f2(posj, oh_m))}")

    # V3: VPU broadcast-reduce, A on lanes
    @jax.jit
    def f3(p, o):
        pT = jnp.transpose(p, (0, 2, 1))  # [S, 3, A]
        prod = o.astype(jnp.float32)[:, :, None, :, :] * pT[None, :, :, None, :]
        return jnp.sum(prod, axis=-1)
    print(f"sel vpu bcast-reduce    : {timeit(lambda: f3(posj, oh))*1e3:6.2f} ms  {check(f3(posj, oh))}")

    # V4: gather take_along_axis
    @jax.jit
    def f4(p, ix):
        g = jnp.take_along_axis(p, ix[:, :, None], axis=1)  # [S,4T,3]
        return jnp.transpose(g.reshape(S, 4, T, 3), (1, 0, 3, 2))
    print(f"sel gather              : {timeit(lambda: f4(posj, idx_flat))*1e3:6.2f} ms  {check(f4(posj, idx_flat))}")

    # V5: merged einsum (one dot call, bf16 onehot)
    @jax.jit
    def f5(p, om):
        out = jnp.einsum("sma,sad->smd", om, p, preferred_element_type=jnp.float32)
        return jnp.transpose(out.reshape(S, 4, T, 3), (1, 0, 3, 2))
    print(f"sel merged einsum       : {timeit(lambda: f5(posj, oh_m))*1e3:6.2f} ms  {check(f5(posj, oh_m))}")

    # --- nonbonded variants -------------------------------------------
    nb_args = (batch.nb_rstar, batch.nb_eps, batch.nb_qq_scale)
    nbref = E._nonbonded_dense(posj, batch)

    def checknb(out):
        return f"maxdiff={float(jnp.max(jnp.abs(out - nbref))):.2e}"

    def nb_core(r2, rstar0, eps, qq):
        Sl = r2.shape[0]
        r2 = jnp.maximum(r2.reshape(Sl, A * A), 1e-2)
        r = jnp.sqrt(r2)
        rstar = jnp.maximum(rstar0, 1e-3)
        ratio = 1.07 * rstar / (r + 0.07 * rstar)
        r7 = r2 ** 3 * r
        rs7 = rstar ** 7
        e_vdw = eps * ratio ** 7 * (1.12 * rs7 / (r7 + 0.12 * rs7) - 2.0)
        rb = r + 0.05
        denom = batch.diel_constant * rb
        e_ele = 332.0716 * qq / denom
        return jnp.sum(e_vdw + e_ele, axis=1)

    @jax.jit
    def n1(p, rs, ep, qq):
        sq = jnp.sum(p * p, axis=-1)
        gram = jnp.einsum("sad,sbd->sab", p, p, preferred_element_type=jnp.float32)
        r2 = sq[:, :, None] + sq[:, None, :] - 2.0 * gram
        return nb_core(r2, rs, ep, qq)
    print(f"nb current gram         : {timeit(lambda: n1(posj, *nb_args))*1e3:6.2f} ms  {checknb(n1(posj, *nb_args))}")

    @jax.jit
    def n2(p, rs, ep, qq):
        pT = jnp.transpose(p, (0, 2, 1))  # [S,3,A]
        d = pT[:, :, :, None] - pT[:, :, None, :]  # [S,3,A,A]
        return nb_core(jnp.sum(d * d, axis=1), rs, ep, qq)
    print(f"nb coord-diff           : {timeit(lambda: n2(posj, *nb_args))*1e3:6.2f} ms  {checknb(n2(posj, *nb_args))}")

    @jax.jit
    def n3(p, rs, ep, qq):
        d = p[:, :, None, :] - p[:, None, :, :]
        return nb_core(jnp.sum(d * d, axis=-1), rs, ep, qq)
    print(f"nb atom-diff            : {timeit(lambda: n3(posj, *nb_args))*1e3:6.2f} ms  {checknb(n3(posj, *nb_args))}")

    # fwd+grad for the promising ones
    for name, f, args in [
        ("nb gram", n1, nb_args), ("nb coord-diff", n2, nb_args),
    ]:
        g = jax.jit(jax.grad(lambda p, *a, f=f: jnp.sum(f(p, *a))))
        print(f"{name:16s} grad : {timeit(lambda: g(posj, *args))*1e3:6.2f} ms")

    for name, f, a in [
        ("sel current", f1, oh), ("sel flipped", f2, oh_m),
        ("sel gather", f4, idx_flat), ("sel vpu", f3, oh),
    ]:
        g = jax.jit(jax.grad(lambda p, aa, f=f: jnp.sum(f(p, aa))))
        print(f"{name:16s} grad : {timeit(lambda: g(posj, a))*1e3:6.2f} ms")


if __name__ == "__main__":
    main()
