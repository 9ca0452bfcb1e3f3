"""Torsion Fingerprint Deviation (TFD) kernels + torsion enumeration.

TPU-native counterpart of the reference's ``src/tfd/`` (SURVEY.md §2.9):
host-side torsion-library preprocessing (``tfd_common.cpp`` role) and two
batched device steps (``tfd_kernels.cu`` role):

  kernel 1: dihedral angles per (conformer x torsion quartet)
  kernel 2: weighted, normalized circular deviations per conformer pair

Differences from RDKit's TorsionFingerprints (documented, since this
build has no RDKit to defer to):

  * quartet choice per rotatable bond: the highest-(degree, Z, index)
    neighbor on each side;
  * symmetry: equivalent terminal neighbors (same element/degree/H
    count) reduce the torsion period, shrinking maxDev to 180/n_equiv;
  * weights (useWeights=True): the smaller atom count of the two sides
    the bond splits the molecule into — a topological importance
    measure normalized over torsions.
"""
from __future__ import annotations

import dataclasses
import functools

import numpy as np

import jax
import jax.numpy as jnp

from nvmolkit_tpu.chem.mol import Mol


@dataclasses.dataclass
class TorsionSet:
    quartets: np.ndarray   # [T, 4] int32
    weights: np.ndarray    # [T] f32
    max_dev: np.ndarray    # [T] f32 (degrees)


def _split_count(mol: Mol, j: int, k: int) -> int:
    """Atoms on the j-side when bond (j,k) is cut (min of both sides)."""
    seen = {j, k}
    stack = [j]
    count = 1
    while stack:
        u = stack.pop()
        for v in mol.neighbors(u):
            if v not in seen:
                seen.add(v)
                count += 1
                stack.append(v)
    n = mol.num_atoms
    return min(count, n - count)


def _pick_ref(mol: Mol, center: int, exclude: int) -> tuple[int, int]:
    """Reference neighbor + count of topologically equivalent choices."""
    nbrs = [x for x in mol.neighbors(center) if x != exclude]
    keyf = lambda x: (
        mol.degree(x),
        mol.atoms[x].atomic_num,
        x,
    )
    best = max(nbrs, key=keyf)
    sig = lambda x: (
        mol.atoms[x].atomic_num,
        mol.degree(x),
        mol.atoms[x].total_hs,
    )
    n_equiv = sum(1 for x in nbrs if sig(x) == sig(best))
    return best, n_equiv


def enumerate_torsions(
    mol: Mol, use_weights: bool = True, max_dev: str = "equal"
) -> TorsionSet:
    """Host-side torsion enumeration over rotatable + ring bonds."""
    quartets, weights, maxdevs = [], [], []
    for b in mol.bonds:
        j, k = b.begin, b.end
        if mol.degree(j) < 2 or mol.degree(k) < 2:
            continue
        i, ni = _pick_ref(mol, j, k)
        l, nl = _pick_ref(mol, k, j)
        if i == l:
            continue  # 3-ring degenerate
        quartets.append((i, j, k, l))
        if max_dev == "equal":
            md = 180.0
        else:  # 'spec': symmetry-reduced period
            md = 180.0 / max(ni, nl, 1)
        maxdevs.append(md)
        weights.append(float(_split_count(mol, j, k)) if use_weights else 1.0)
    if not quartets:
        return TorsionSet(
            np.zeros((0, 4), np.int32), np.zeros(0, np.float32), np.zeros(0, np.float32)
        )
    return TorsionSet(
        np.asarray(quartets, np.int32),
        np.asarray(weights, np.float32),
        np.asarray(maxdevs, np.float32),
    )


@functools.partial(jax.jit, static_argnames=())
def dihedral_angles(
    confs: jnp.ndarray,     # [C, A, 3]
    quartets: jnp.ndarray,  # [T, 4]
) -> jnp.ndarray:
    """Signed dihedral angles in degrees -> [C, T]."""
    p = confs[:, quartets]  # [C, T, 4, 3]
    b1 = p[:, :, 1] - p[:, :, 0]
    b2 = p[:, :, 2] - p[:, :, 1]
    b3 = p[:, :, 3] - p[:, :, 2]
    n1 = jnp.cross(b1, b2)
    n2 = jnp.cross(b2, b3)
    m1 = jnp.cross(n1, b2 / jnp.linalg.norm(b2, axis=-1, keepdims=True).clip(1e-9))
    x = jnp.sum(n1 * n2, axis=-1)
    y = jnp.sum(m1 * n2, axis=-1)
    return jnp.degrees(jnp.arctan2(y, x))


@functools.partial(jax.jit, static_argnames=())
def tfd_matrix_condensed(
    angles: jnp.ndarray,   # [C, T] degrees
    weights: jnp.ndarray,  # [T]
    max_dev: jnp.ndarray,  # [T]
    pair_idx: jnp.ndarray, # [P, 2]
) -> jnp.ndarray:
    """TFD per conformer pair (condensed) -> [P]."""
    a = angles[pair_idx[:, 0]]   # [P, T]
    b = angles[pair_idx[:, 1]]
    d = jnp.abs(a - b) % 360.0
    d = jnp.minimum(d, 360.0 - d)
    dev = jnp.minimum(d / jnp.maximum(max_dev, 1e-6), 1.0)
    wsum = jnp.maximum(jnp.sum(weights), 1e-9)
    return jnp.sum(dev * weights, axis=1) / wsum
