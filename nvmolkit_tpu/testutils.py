"""Test utilities: molecule loaders and conformer validity checkers.

Counterpart of the reference's ``src/testutils/`` (``mol_data.h:57``
``loadNChemblMolecules``; ``conformer_checkers`` bounds/chirality
validators). Without bundled ChEMBL data, molecules come from the
deterministic scaffold-x-substituent generator.
"""
from __future__ import annotations

import numpy as np

from nvmolkit_tpu.chem.mol import Mol


def load_n_molecules(n: int, max_atoms: int | None = None) -> list[Mol]:
    """n deterministic drug-like molecules (optionally capped by size)."""
    import sys
    from pathlib import Path

    bench_dir = str(Path(__file__).resolve().parents[1] / "benchmarks")
    if bench_dir not in sys.path:
        sys.path.insert(0, bench_dir)
    from _common import make_smiles

    from nvmolkit_tpu.chem.native import mols_from_smiles

    overshoot = n * 2 if max_atoms else n
    mols = mols_from_smiles(make_smiles(overshoot))
    if max_atoms:
        mols = [m for m in mols if m.num_atoms <= max_atoms]
    if len(mols) < n:
        raise ValueError(f"only {len(mols)} molecules satisfy max_atoms={max_atoms}")
    return mols[:n]


def check_bounds_satisfied(
    mol: Mol, positions: np.ndarray, tolerance: float = 0.35
) -> bool:
    """True iff all pairwise distances sit within the (smoothed)
    topological bounds stretched by ``tolerance``."""
    import jax.numpy as jnp

    from nvmolkit_tpu.chem.bounds import topological_bounds
    from nvmolkit_tpu.ops.triangle_smooth import triangle_smooth_bounds

    u, l = topological_bounds(mol)
    n = mol.num_atoms
    ub, lb, ok = triangle_smooth_bounds(
        jnp.asarray(u[None]), jnp.asarray(l[None]), jnp.ones((1, n), bool)
    )
    if not bool(ok[0]):
        return False
    ub = np.asarray(ub[0])
    lb = np.asarray(lb[0])
    d = np.linalg.norm(positions[:, None] - positions[None, :], axis=-1)
    iu = np.triu_indices(n, 1)
    hi_ok = d[iu] <= ub[iu] * (1 + tolerance)
    lo_ok = d[iu] >= lb[iu] * (1 - tolerance)
    return bool(hi_ok.all() and lo_ok.all())


def check_chirality_preserved(mol: Mol, positions: np.ndarray) -> bool:
    """True iff every parsed @/@@ center has the demanded volume sign."""
    from nvmolkit_tpu.models.dist_geom import build_chiral_sets

    cidx, clb, cub = build_chiral_sets(mol)
    for k in range(len(cidx)):
        pts = positions[cidx[k]]
        v = float(np.dot(pts[0] - pts[3], np.cross(pts[1] - pts[3], pts[2] - pts[3])))
        if not (clb[k] <= v <= cub[k]):
            return False
    return True
