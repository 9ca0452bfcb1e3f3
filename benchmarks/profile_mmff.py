"""Round-4 MMFF profiling: where does minimize wall time go?

Decomposes the public-API MMFF number into (a) device steps taken,
(b) raw energy+grad eval throughput, (c) loop overhead, and measures
candidate energy-eval variants (precision scoping, Gram-vs-diff
nonbonded, select strategies) against the current implementation.

Run on the real chip: python benchmarks/profile_mmff.py

This is the ONE MMFF profiling entry point (the round-4 one-off variant
scripts profile_mmff2..6 were folded into ROUND4_NOTES.md's findings and
deleted — VERDICT r4 cleanup item 10). Pass --help for knobs.
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


def timeit(fn, reps=10, inner_sync=None):
    fn()  # warm/compile
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
    from nvmolkit_tpu.mmffOptimization import MMFFOptimizeMoleculesConfs
    from nvmolkit_tpu.types import CoordinateOutput

    mols = mols_from_smiles(make_smiles(1024))
    EmbedMolecules(mols, confsPerMolecule=8, maxIterations=8)
    mols = [m for m in mols if m.conformers]
    n_systems = sum(len(m.conformers) for m in mols)
    print(f"n_mols={len(mols)} n_systems={n_systems}")

    # --- 1. public API baseline ---------------------------------------
    MMFFOptimizeMoleculesConfs(mols, maxIters=200, output=CoordinateOutput.DEVICE)
    best = float("inf")
    for _ in range(4):
        t0 = time.perf_counter()
        MMFFOptimizeMoleculesConfs(mols, maxIters=200, output=CoordinateOutput.DEVICE)
        best = min(best, time.perf_counter() - t0)
    print(f"public API: {best:.3f}s = {n_systems/best:.0f} min/s")

    # --- 2. reach inside: build the batch ourselves -------------------
    from nvmolkit_tpu.models.mmff.energy import (
        MMFFBatch, make_batched_mmff, mmff_energy_and_grad,
    )
    # simple: single bucket = max atoms rounded to 32
    amax = max(m.num_atoms for m in mols)
    print("max atoms:", amax)
    bucket = 32 * ((amax + 31) // 32)

    # conformer-expanded systems
    sys_mols, positions = [], []
    for m in mols:
        for c in m.conformers:
            sys_mols.append(m)
            positions.append(np.asarray(c))
    S = len(sys_mols)
    A = bucket
    pos = np.zeros((S, A, 3), np.float32)
    for i, (m, p) in enumerate(zip(sys_mols, positions)):
        pos[i, : m.num_atoms] = p
    batch = make_batched_mmff(sys_mols, A)
    print(f"S={S} A={A} sel_idx={batch.sel_idx.shape} onehot={batch.onehot.shape} "
          f"onehot_dtype={batch.onehot.dtype} "
          f"onehot_MB={batch.onehot.size * batch.onehot.dtype.itemsize / 1e6:.0f}")
    for kind, start, count in batch.offsets:
        print(f"  {kind}: T={count}")

    posj = jnp.asarray(pos)

    eg = jax.jit(mmff_energy_and_grad)
    t = timeit(lambda: eg(posj, batch))
    print(f"energy_and_grad: {t*1e3:.2f} ms/eval -> {1/t:.0f} evals/s")

    # --- 3. minimize step count + per-step -----------------------------
    from nvmolkit_tpu.ops.lbfgs_flat import batched_lbfgs_flat_minimize
    amask = jnp.asarray(pos.sum(-1) != 0) | (jnp.arange(A)[None, :] < jnp.asarray(
        [m.num_atoms for m in sys_mols])[:, None])
    res = batched_lbfgs_flat_minimize(
        mmff_energy_and_grad, posj, amask, max_iters=200, energy_args=batch,
        max_steps=4 * 96)
    jax.block_until_ready(res.positions)
    t0 = time.perf_counter()
    res = batched_lbfgs_flat_minimize(
        mmff_energy_and_grad, posj, amask, max_iters=200, energy_args=batch,
        max_steps=4 * 96)
    jax.block_until_ready(res.positions)
    el = time.perf_counter() - t0
    steps = int(res.n_iters)
    print(f"phase1 minimize: {el:.3f}s steps={steps} -> {el/steps*1e3:.2f} ms/step "
          f"(pure eval would be {t*1e3:.2f} ms)")
    print(f"conv after phase1: {float(jnp.mean(res.converged.astype(jnp.float32))):.4f}")


if __name__ == "__main__":
    main()
