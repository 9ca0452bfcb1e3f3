"""Pairwise conformer RMSD matrices — public API.

Mirrors the reference's ``nvmolkit/conformerRmsd.py``:
``GetConformerRMSMatrix(mol, prealigned=False)`` returns the condensed
lower-triangle RMSD vector (index (i, j), i > j -> i(i-1)/2 + j), ready
to feed :func:`nvmolkit_tpu.clustering.butina`;
``GetConformerRMSMatrixBatch`` processes many molecules in one batched
kernel launch (the reference maps global block ranges per molecule,
``conformer_rmsd.h:51-80``).
"""
from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from nvmolkit_tpu.chem.mol import Mol
from nvmolkit_tpu.ops.kabsch import batched_kabsch_rmsd, plain_rmsd
from nvmolkit_tpu.types import AsyncResult


def _pairs(n: int) -> np.ndarray:
    idx = []
    for i in range(1, n):
        for j in range(i):
            idx.append((i, j))
    return np.asarray(idx, np.int32).reshape(-1, 2)


def GetConformerRMSMatrix(
    mol: Mol, prealigned: bool = False, heavyAtomsOnly: bool = False
) -> AsyncResult:
    """Condensed lower-triangle RMSD over all conformer pairs of ``mol``."""
    n_conf = len(mol.conformers)
    if n_conf < 2:
        raise ValueError("molecule needs at least 2 conformers")
    return GetConformerRMSMatrixBatch([mol], prealigned, heavyAtomsOnly)[0]


def GetConformerRMSMatrixBatch(
    mols: list[Mol], prealigned: bool = False, heavyAtomsOnly: bool = False
) -> list[AsyncResult]:
    """Batched condensed RMSD matrices, one per molecule."""
    if not mols:
        return []
    max_atoms = max(m.num_atoms for m in mols)

    all_a, all_b, all_mask, counts = [], [], [], []
    for m in mols:
        n_conf = len(m.conformers)
        if n_conf < 2:
            raise ValueError("every molecule needs at least 2 conformers")
        pairs = _pairs(n_conf)
        counts.append(len(pairs))
        mask_row = np.zeros(max_atoms, bool)
        if heavyAtomsOnly:
            heavy = np.asarray([a.atomic_num > 1 for a in m.atoms])
            mask_row[: m.num_atoms] = heavy
        else:
            mask_row[: m.num_atoms] = True
        confs = np.zeros((n_conf, max_atoms, 3), np.float32)
        for c, coords in enumerate(m.conformers):
            confs[c, : m.num_atoms] = coords
        all_a.append(confs[pairs[:, 0]])
        all_b.append(confs[pairs[:, 1]])
        all_mask.append(np.broadcast_to(mask_row, (len(pairs), max_atoms)))

    pos_a = jnp.asarray(np.concatenate(all_a))
    pos_b = jnp.asarray(np.concatenate(all_b))
    mask = jnp.asarray(np.concatenate(all_mask))
    fn = plain_rmsd if prealigned else batched_kabsch_rmsd
    # one launch + one transfer; per-molecule results are host slices
    rms = np.asarray(fn(pos_a, pos_b, mask))

    out, cursor = [], 0
    for c in counts:
        out.append(AsyncResult(rms[cursor : cursor + c]))
        cursor += c
    return out
