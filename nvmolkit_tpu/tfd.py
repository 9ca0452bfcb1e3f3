"""Torsion Fingerprint Deviation matrices — public API.

Mirrors the reference's ``nvmolkit/tfd.py:126-195``: ``GetTFDMatrix`` /
``GetTFDMatrices`` return condensed lower-triangle TFD values over a
molecule's conformer pairs (feedable to Butina clustering).
"""
from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from nvmolkit_tpu.chem.mol import Mol
from nvmolkit_tpu.ops.tfd import dihedral_angles, enumerate_torsions, tfd_matrix_condensed
from nvmolkit_tpu.types import AsyncResult


def _pairs(n: int) -> np.ndarray:
    return np.asarray(
        [(i, j) for i in range(1, n) for j in range(i)], np.int32
    ).reshape(-1, 2)


def GetTFDMatrix(
    mol: Mol,
    useWeights: bool = True,
    maxDev: str = "equal",
    symmRadius: int = 2,
    ignoreColinearBonds: bool = True,
) -> AsyncResult:
    """Condensed TFD matrix over all conformer pairs of one molecule."""
    return GetTFDMatrices([mol], useWeights, maxDev, symmRadius, ignoreColinearBonds)[0]


def GetTFDMatrices(
    mols: list[Mol],
    useWeights: bool = True,
    maxDev: str = "equal",
    symmRadius: int = 2,
    ignoreColinearBonds: bool = True,
) -> list[AsyncResult]:
    """Batched condensed TFD matrices, one per molecule."""
    del symmRadius, ignoreColinearBonds  # parity args; see ops/tfd.py notes
    if maxDev not in ("equal", "spec"):
        raise ValueError("maxDev must be 'equal' or 'spec'")
    out = []
    for m in mols:
        n_conf = len(m.conformers)
        if n_conf < 2:
            raise ValueError("every molecule needs at least 2 conformers")
        ts = enumerate_torsions(m, use_weights=useWeights, max_dev=maxDev)
        pairs = _pairs(n_conf)
        if ts.quartets.shape[0] == 0:
            out.append(AsyncResult(jnp.zeros(len(pairs), jnp.float32)))
            continue
        confs = jnp.asarray(
            np.stack([c.astype(np.float32) for c in m.conformers])
        )
        angles = dihedral_angles(confs, jnp.asarray(ts.quartets))
        tfd = tfd_matrix_condensed(
            angles,
            jnp.asarray(ts.weights),
            jnp.asarray(ts.max_dev),
            jnp.asarray(pairs),
        )
        out.append(AsyncResult(tfd))
    return out
