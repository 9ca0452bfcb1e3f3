"""Greedy RMS-threshold conformer pruning.

Counterpart of the reference's ``rdkit_extensions/conformer_pruning.h``
(RDKit-matching greedy pruning during writeback): conformers are
considered in order; one is kept iff its best-alignment RMSD to every
already-kept conformer exceeds the threshold. The full pairwise RMSD
matrix comes from one batched Kabsch launch; the greedy scan is host-side.
"""
from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from nvmolkit_tpu.ops.kabsch import batched_kabsch_rmsd


def prune_conformers(
    positions: np.ndarray,  # [C, n_atoms, 3]
    threshold: float,
) -> np.ndarray:
    """Indices of kept conformers (in original order)."""
    C = positions.shape[0]
    if C <= 1 or threshold <= 0:
        return np.arange(C)
    pairs = np.asarray([(i, j) for i in range(1, C) for j in range(i)], np.int32)
    pos = jnp.asarray(positions, jnp.float32)
    mask = jnp.ones((len(pairs), positions.shape[1]), bool)
    rms = np.asarray(batched_kabsch_rmsd(pos[pairs[:, 0]], pos[pairs[:, 1]], mask))
    rms_mat = np.zeros((C, C))
    for p, (i, j) in enumerate(pairs):
        rms_mat[i, j] = rms_mat[j, i] = rms[p]

    kept: list[int] = []
    for c in range(C):
        if all(rms_mat[c, k] > threshold for k in kept):
            kept.append(c)
    return np.asarray(kept, np.int64)
