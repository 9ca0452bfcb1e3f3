"""Torsion Fingerprint Deviation (TFD) kernels + torsion enumeration.

TPU-native counterpart of the reference's ``src/tfd/`` (SURVEY.md §2.9)
with RDKit ``TorsionFingerprints`` parity semantics
(``src/tfd/tfd_common.cpp``):

  * rotatable-bond selection skips ring bonds, bonds without heavy
    neighbors on both sides, and (with ``ignore_colinear_bonds``) bonds
    whose pivot atoms sit next to triple bonds or are allene centers;
    with ``ignore_colinear_bonds=False`` the pivot walks outward past
    the colinear unit instead (``getBondsForTorsions``);
  * quartet selection per side uses Morgan-environment invariants at
    ``symm_radius``: a single neighbor is taken as-is; fully symmetric
    neighbors contribute ALL quartets; 3 neighbors where exactly one
    differs contribute that one; otherwise the smallest-invariant
    neighbor (``getIndexForTorsion``);
  * every SSSR ring adds one Ring torsion with its N consecutive
    quartets and maxDev = 180 * exp(-0.025 (n-14)^2) below 14 atoms;
  * ``max_dev_mode='spec'`` assigns the published per-case deviations
    (90/60/30) for symmetric sides; 'equal' uses 180 for all;
  * weights are exp(-beta d^2) in topological distance from the most
    central bond (minimum-distance-STD atom pair), ring torsions use
    the average distance over the ring's bonds times n/2
    (``computeTorsionWeights``).

Device steps (``tfd_kernels.cu`` role): batched dihedral angles per
(conformer x quartet) in the reference's [0, 360) convention, then per
conformer pair the per-torsion deviation — Single: circular difference;
Ring: difference of per-conformer mean |angle - 180|; Symmetric: min
circular difference over all quartet pairings — normalized by maxDev
and combined as a weighted mean.
"""
from __future__ import annotations

import dataclasses
import functools
import math
from collections import deque

import numpy as np

import jax
import jax.numpy as jnp

from nvmolkit_tpu.chem.mol import Mol

TORSION_SINGLE = 0
TORSION_RING = 1
TORSION_SYMMETRIC = 2


@dataclasses.dataclass
class TorsionSet:
    """Per-molecule torsion library (ragged: quartets CSR per torsion)."""

    quartets: np.ndarray        # [Qtot, 4] int32
    quartet_starts: np.ndarray  # [T+1] int32
    types: np.ndarray           # [T] int32 (TORSION_*)
    weights: np.ndarray         # [T] f32
    max_dev: np.ndarray         # [T] f32 (degrees)

    @property
    def n_torsions(self) -> int:
        return len(self.types)

    @staticmethod
    def empty() -> "TorsionSet":
        return TorsionSet(
            np.zeros((0, 4), np.int32), np.zeros(1, np.int32),
            np.zeros(0, np.int32), np.zeros(0, np.float32),
            np.zeros(0, np.float32),
        )


def _heavy_neighbors(mol: Mol, atom: int, exclude: int = -1) -> list[int]:
    return [
        v
        for v in mol.neighbors(atom)
        if mol.atoms[v].atomic_num != 1 and v != exclude
    ]


def _bonds_for_torsions(
    mol: Mol, ignore_colinear_bonds: bool
) -> list[tuple[int, int, list[int], list[int]]]:
    """(a1, a2, nb1, nb2) per torsion bond (getBondsForTorsions)."""
    n = mol.num_atoms
    flags = [0] * n
    for b in mol.bonds:
        if b.order == 3.0:
            flags[b.begin] = flags[b.end] = 1
    for i, atom in enumerate(mol.atoms):
        if atom.atomic_num != 6:
            continue
        if sum(1 for bi in mol.atom_bonds(i) if mol.bonds[bi].order == 2.0) == 2:
            flags[i] = 1

    out = []
    done = [False] * mol.num_bonds
    for bi, b in enumerate(mol.bonds):
        if b.in_ring:
            continue
        a1, a2 = b.begin, b.end
        nb1 = _heavy_neighbors(mol, a1, a2)
        nb2 = _heavy_neighbors(mol, a2, a1)
        if done[bi] or not nb1 or not nb2:
            continue
        done[bi] = True
        if flags[a1] or flags[a2]:
            if ignore_colinear_bonds:
                continue
            # walk outward past the colinear unit (RDKit's else branch)
            while len(nb1) == 1 and flags[a1]:
                a1_old, a1 = a1, nb1[0]
                bb = mol.bond_between(a1_old, a1)
                if bb is None:
                    break
                nb1 = _heavy_neighbors(mol, a1, a1_old)
                done[_bond_index(mol, a1_old, a1)] = True
            while len(nb2) == 1 and flags[a2]:
                a2_old, a2 = a2, nb2[0]
                bb = mol.bond_between(a2_old, a2)
                if bb is None:
                    break
                nb2 = _heavy_neighbors(mol, a2, a2_old)
                done[_bond_index(mol, a2_old, a2)] = True
            if nb1 and nb2:
                out.append((a1, a2, nb1, nb2))
        else:
            out.append((a1, a2, nb1, nb2))
    return out


def _bond_index(mol: Mol, a: int, b: int) -> int:
    for bi in mol.atom_bonds(a):
        if mol.bonds[bi].other(a) == b:
            return bi
    raise KeyError((a, b))


def _index_for_torsion(neighbors: list[int], inv: np.ndarray) -> list[int]:
    """Reference atoms for one side of a torsion (getIndexForTorsion)."""
    if len(neighbors) == 1:
        return neighbors
    invs = [int(inv[x]) for x in neighbors]
    if len(set(invs)) == 1:
        return neighbors  # all symmetric: keep all
    if len(neighbors) == 3:
        # exactly one different
        for x in range(3):
            others = [invs[y] for y in range(3) if y != x]
            if others[0] == others[1] and invs[x] != others[0]:
                return [neighbors[x]]
    return [min(neighbors, key=lambda x: int(inv[x]))]


def _topological_distances(mol: Mol) -> np.ndarray:
    """All-pairs unweighted shortest-path distances [n, n] (float)."""
    n = mol.num_atoms
    dist = np.full((n, n), 1e6, np.float64)
    for s in range(n):
        dist[s, s] = 0.0
        q = deque([s])
        while q:
            u = q.popleft()
            for v in mol.neighbors(u):
                if dist[s, v] > dist[s, u] + 1:
                    dist[s, v] = dist[s, u] + 1
                    q.append(v)
    return dist


def _find_central_bond(mol: Mol, dist: np.ndarray) -> tuple[int, int]:
    """Atom pair of the most central bond (min distance STD), or (-1,-1)."""
    n = mol.num_atoms
    stds = []
    for i in range(n):
        if len(_heavy_neighbors(mol, i)) < 2:
            continue
        d = np.delete(dist[i], i)
        stds.append((float(d.std()), i))
    if not stds:
        return -1, -1
    stds.sort()
    aid1 = stds[0][1]
    for _, cand in stds[1:]:
        if mol.bond_between(aid1, cand) is not None:
            return aid1, cand
    return -1, -1


def _beta(mol: Mol, dist: np.ndarray, aid1: int) -> float:
    """Weight decay parameter (calculateBeta, post-typo-fix RDKit)."""
    dmax = 0.0
    for b in mol.bonds:
        nb1 = _heavy_neighbors(mol, b.begin)
        nb2 = _heavy_neighbors(mol, b.end)
        if len(nb1) > 1 and len(nb2) > 1:
            d = max(dist[aid1, b.begin], dist[aid1, b.end])
            dmax = max(dmax, d)
    dmax2 = dmax / 2.0
    if dmax2 < 1e-6:
        dmax2 = 1.0
    return -math.log(0.1) / (dmax2 * dmax2)


def enumerate_torsions(
    mol: Mol,
    use_weights: bool = True,
    max_dev: str = "equal",
    symm_radius: int = 2,
    ignore_colinear_bonds: bool = True,
) -> TorsionSet:
    """Host-side torsion enumeration with RDKit TorsionFingerprints
    semantics (see module docstring)."""
    from nvmolkit_tpu.chem.rings import get_bond_rings, get_sssr
    from nvmolkit_tpu.ops.morgan_cpu import morgan_atom_invariants_at_radius

    bonds = _bonds_for_torsions(mol, ignore_colinear_bonds)

    if symm_radius > 0:
        inv = morgan_atom_invariants_at_radius(mol, symm_radius)
    else:
        inv = np.asarray([mol.degree(i) for i in range(mol.num_atoms)], np.uint32)

    quartets: list[tuple[int, int, int, int]] = []
    starts = [0]
    types: list[int] = []
    maxdevs: list[float] = []

    for a1, a2, nb1, nb2 in bonds:
        d1 = _index_for_torsion(nb1, inv)
        d2 = _index_for_torsion(nb2, inv)
        if max_dev == "equal":
            qs = [(x, a1, a2, y) for x in d1 for y in d2]
            md = 180.0
        else:  # 'spec'
            if len(d1) == 1 and len(d2) == 1:
                qs = [(d1[0], a1, a2, d2[0])]
                md = 180.0
            elif len(d1) == 1:
                qs = [(d1[0], a1, a2, y) for y in d2]
                md = 90.0 if len(nb2) == 2 else 60.0
            elif len(d2) == 1:
                qs = [(x, a1, a2, d2[0]) for x in d1]
                md = 90.0 if len(nb1) == 2 else 60.0
            else:
                qs = [(x, a1, a2, y) for x in d1 for y in d2]
                if len(nb1) == 2 and len(nb2) == 2:
                    md = 90.0
                elif len(nb1) == 3 and len(nb2) == 3:
                    md = 60.0
                else:
                    md = 30.0
        if not qs:
            continue
        quartets.extend(qs)
        starts.append(len(quartets))
        types.append(TORSION_SYMMETRIC if len(qs) > 1 else TORSION_SINGLE)
        maxdevs.append(md)

    n_nonring = len(types)
    rings = get_sssr(mol)
    for ring in rings:
        num = len(ring)
        md = 180.0 if num >= 14 else 180.0 * math.exp(-0.025 * (num - 14) ** 2)
        qs = [
            (ring[i], ring[(i + 1) % num], ring[(i + 2) % num], ring[(i + 3) % num])
            for i in range(num)
        ]
        quartets.extend(qs)
        starts.append(len(quartets))
        types.append(TORSION_RING if len(qs) > 1 else TORSION_SINGLE)
        maxdevs.append(md)

    if not types:
        return TorsionSet.empty()

    # weights
    if use_weights:
        dist = _topological_distances(mol)
        aid1, aid2 = _find_central_bond(mol, dist)
        if aid1 < 0:
            weights = [1.0] * len(types)
        else:
            beta = _beta(mol, dist, aid1)
            weights = []
            for a1, a2, _nb1, _nb2 in bonds:
                if {a1, a2} == {aid1, aid2}:
                    d = 0.0
                else:
                    d = (
                        min(
                            dist[aid1, a1], dist[aid1, a2],
                            dist[aid2, a1], dist[aid2, a2],
                        )
                        + 1.0
                    )
                weights.append(math.exp(-beta * d * d))
            for bond_ring in get_bond_rings(mol):
                num = len(bond_ring)
                sum_d = 0.0
                for bidx in bond_ring:
                    b = mol.bonds[bidx]
                    sum_d += (
                        min(
                            dist[aid1, b.begin], dist[aid1, b.end],
                            dist[aid2, b.begin], dist[aid2, b.end],
                        )
                        + 1.0
                    )
                avg_d = sum_d / num
                weights.append(math.exp(-beta * avg_d * avg_d) * (num / 2.0))
            # non-ring weight list aligns with `bonds`; drop entries for
            # bonds that produced no quartets (never happens: nb1/nb2
            # non-empty implies quartets), and truncate/extend defensively
            weights = weights[: len(types)]
            while len(weights) < len(types):
                weights.append(1.0)
    else:
        weights = [1.0] * len(types)

    del n_nonring
    return TorsionSet(
        np.asarray(quartets, np.int32),
        np.asarray(starts, np.int32),
        np.asarray(types, np.int32),
        np.asarray(weights, np.float32),
        np.asarray(maxdevs, np.float32),
    )


@functools.partial(jax.jit, static_argnames=())
def dihedral_angles(
    confs: jnp.ndarray,     # [C, A, 3]
    quartets: jnp.ndarray,  # [T, Q, 4]
) -> jnp.ndarray:
    """Dihedral angles in the reference's [0, 360) convention -> [C, T, Q].

    Matches ``tfd_detail.h computeDihedralAngle``: n1 = (p1-p2) x (p3-p2),
    n2 = (p3-p2) x (p4-p3), angle = acos(n1.n2) signed by (n1 x n2).b1.
    """
    p = confs[:, quartets]  # [C, T, Q, 4, 3]
    b1 = p[..., 2, :] - p[..., 1, :]
    v1 = p[..., 0, :] - p[..., 1, :]
    v2 = p[..., 3, :] - p[..., 2, :]
    n1 = jnp.cross(v1, b1)
    n2 = jnp.cross(b1, v2)
    x = jnp.sum(n1 * n2, axis=-1)
    y = jnp.sum(jnp.cross(n1, n2) * b1, axis=-1) / jnp.maximum(
        jnp.linalg.norm(b1, axis=-1), 1e-10
    )
    deg = jnp.degrees(jnp.arctan2(y, x))
    # degenerate normals -> 0 like the reference
    n1n = jnp.linalg.norm(n1, axis=-1)
    n2n = jnp.linalg.norm(n2, axis=-1)
    deg = jnp.where((n1n < 1e-10) | (n2n < 1e-10), 0.0, deg)
    return jnp.where(deg < 0.0, deg + 360.0, deg)


def _circ_diff(a, b):
    d = jnp.abs(a - b)
    return jnp.minimum(d, 360.0 - d)


@functools.partial(jax.jit, static_argnames=())
def tfd_matrix_condensed(
    angles: jnp.ndarray,        # [C, T, Q] degrees [0, 360)
    quartet_mask: jnp.ndarray,  # [T, Q] bool
    types: jnp.ndarray,         # [T] int32
    weights: jnp.ndarray,       # [T] (0 = padded torsion)
    max_dev: jnp.ndarray,       # [T]
    torsion_mask: jnp.ndarray,  # [T] bool
    pair_idx: jnp.ndarray,      # [P, 2]
) -> jnp.ndarray:
    """TFD per conformer pair (condensed) -> [P]."""
    a = angles[pair_idx[:, 0]]  # [P, T, Q]
    b = angles[pair_idx[:, 1]]
    qm = quartet_mask[None]     # [1, T, Q]

    # Single: first quartet's circular difference
    dev_single = _circ_diff(a[..., 0], b[..., 0])

    # Ring: |mean_q |a - 180| - mean_q |b - 180||
    nq = jnp.maximum(jnp.sum(quartet_mask, axis=1), 1)[None]  # [1, T]
    avg_a = jnp.sum(jnp.where(qm, jnp.abs(a - 180.0), 0.0), axis=-1) / nq
    avg_b = jnp.sum(jnp.where(qm, jnp.abs(b - 180.0), 0.0), axis=-1) / nq
    dev_ring = jnp.abs(avg_a - avg_b)

    # Symmetric: min over all (qa, qb) pairings
    pair_d = _circ_diff(a[..., :, None], b[..., None, :])  # [P, T, Q, Q]
    pair_ok = qm[..., :, None] & qm[..., None, :]
    dev_sym = jnp.min(jnp.where(pair_ok, pair_d, 180.0), axis=(-2, -1))

    dev = jnp.where(
        types[None] == TORSION_RING,
        dev_ring,
        jnp.where(types[None] == TORSION_SYMMETRIC, dev_sym, dev_single),
    ) / jnp.maximum(max_dev[None], 1e-6)

    w = jnp.where(torsion_mask, weights, 0.0)[None]
    wsum = jnp.sum(w, axis=1)
    num = jnp.sum(dev * w, axis=1)
    return jnp.where(wsum > 1e-10, num / jnp.maximum(wsum, 1e-10), 0.0)
