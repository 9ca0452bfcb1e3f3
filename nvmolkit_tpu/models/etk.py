"""ETK (experimental-torsion + basic-knowledge) 3-D refinement terms.

Counterpart of the reference's ETK force field
(``src/forcefields/dist_geom.h:62-94``: ``ETKTerm`` enum — experimental
torsion, inversion/improper, 1-2/1-3 distance, angle, long-distance
bounds). The 3-D stage runs after the 4-D DG minimization
(``etkdg_stage_etk_minimization.*``).

Terms:
  * bounds (long-distance): the dense DG distance-violation energy in 3-D
  * improper: (1 - cos w) planarity penalty at sp2 centers
    ("basic knowledge" / KDG)
  * experimental torsions: E = sum_k F_k (1 + cos(k phi - phi0_k)),
    k = 1..6 — parameters come from a torsion-preference provider (the
    published ETKDG torsion library is data the build does not embed;
    RDKit-backed or user-supplied tables plug in here)
"""
from __future__ import annotations

import dataclasses
import functools

import numpy as np

import jax
import jax.numpy as jnp

from nvmolkit_tpu.chem.mol import Mol
from nvmolkit_tpu.models.dist_geom import dg_energy


@dataclasses.dataclass
class ETKTermsHost:
    improper_idx: np.ndarray   # [I, 4] (i, center, k, l)
    improper_k: np.ndarray     # [I]
    torsion_idx: np.ndarray    # [T, 4]
    torsion_coeffs: np.ndarray  # [T, 6] F_k
    torsion_phase: np.ndarray   # [T, 6] phi0_k (radians)


def build_etk_terms(mol: Mol, torsion_provider=None) -> ETKTermsHost:
    """Improper (planarity) terms from the graph; experimental-torsion
    terms from ``torsion_provider(mol) -> (idx, coeffs, phase)`` if
    given.

    Results cache on the Mol keyed by provider identity (the reference
    caches per-ROMol contribs the same way, ``bfgs_mmff.cpp:199``);
    editing the Mol's graph afterwards requires a fresh Mol or deleting
    ``_etk_terms_cache``.
    """
    cache = getattr(mol, "_etk_terms_cache", None)
    if cache is not None and cache[0] is torsion_provider:
        return cache[1]
    out = _build_etk_terms_uncached(mol, torsion_provider)
    mol._etk_terms_cache = (torsion_provider, out)
    return out


def _build_etk_terms_uncached(mol: Mol, torsion_provider=None) -> ETKTermsHost:
    from nvmolkit_tpu.models.uff.builder import _hybridization

    imp_idx, imp_k = [], []
    for j in range(mol.num_atoms):
        if mol.degree(j) != 3:
            continue
        if mol.atoms[j].atomic_num not in (6, 7):
            continue
        if _hybridization(mol, j) != 2:
            continue
        nbrs = mol.neighbors(j)
        imp_idx.append((nbrs[0], j, nbrs[1], nbrs[2]))
        imp_k.append(10.0)

    # planarity torsions around aromatic and double bonds:
    # E = F2 (1 + cos(2 phi - pi)) = F2 (1 - cos 2 phi), minima at
    # phi = 0/180. Degree-2 aromatic CH carbons have no improper
    # center (the H is implicit), so bond-centered torsions carry the
    # "basic knowledge" planarity instead. SINGLE bonds between two
    # sp2 systems (biaryls, dienes, amides) are NOT pinned here — the
    # experimental-torsion library carries their real preferences
    # (biphenyl twists ~42 deg; pinning it planar was a round-2 bug).
    t_rows: list[tuple[int, int, int, int]] = []
    t_c: list[np.ndarray] = []
    t_p: list[np.ndarray] = []
    for b in mol.bonds:
        j, k = b.begin, b.end
        if not (b.is_aromatic or b.order >= 2):
            continue
        if _hybridization(mol, j) != 2 or _hybridization(mol, k) != 2:
            continue
        if mol.degree(j) < 2 or mol.degree(k) < 2:
            continue
        for i in mol.neighbors(j):
            if i == k:
                continue
            for l in mol.neighbors(k):
                if l == j or l == i:
                    continue
                coeffs = np.zeros(6, np.float32)
                phase = np.zeros(6, np.float32)
                coeffs[1] = 5.0
                phase[1] = np.pi
                t_rows.append((i, j, k, l))
                t_c.append(coeffs)
                t_p.append(phase)

    if torsion_provider is not None:
        p_idx, p_coeffs, p_phase = torsion_provider(mol)
        for r in range(len(p_idx)):
            t_rows.append(tuple(int(x) for x in p_idx[r]))
            t_c.append(np.asarray(p_coeffs[r], np.float32))
            t_p.append(np.asarray(p_phase[r], np.float32))

    if t_rows:
        t_idx = np.asarray(t_rows, np.int32)
        t_coeffs = np.stack(t_c)
        t_phase = np.stack(t_p)
    else:
        t_idx = np.zeros((0, 4), np.int32)
        t_coeffs = np.zeros((0, 6), np.float32)
        t_phase = np.zeros((0, 6), np.float32)

    return ETKTermsHost(
        improper_idx=(
            np.asarray(imp_idx, np.int32) if imp_idx else np.zeros((0, 4), np.int32)
        ),
        improper_k=np.asarray(imp_k, np.float32),
        torsion_idx=np.asarray(t_idx, np.int32).reshape(-1, 4),
        torsion_coeffs=np.asarray(t_coeffs, np.float32).reshape(-1, 6),
        torsion_phase=np.asarray(t_phase, np.float32).reshape(-1, 6),
    )


def pad_etk_batch(terms: list[ETKTermsHost]) -> dict[str, np.ndarray]:
    """Pad per-system ETK terms into [S, Imax, ...] arrays with masks."""
    S = len(terms)
    Imax = max(1, max(t.improper_idx.shape[0] for t in terms))
    Tmax = max(1, max(t.torsion_idx.shape[0] for t in terms))
    out = {
        "improper_idx": np.zeros((S, Imax, 4), np.int32),
        "improper_k": np.zeros((S, Imax), np.float32),
        "improper_mask": np.zeros((S, Imax), bool),
        "torsion_idx": np.zeros((S, Tmax, 4), np.int32),
        "torsion_coeffs": np.zeros((S, Tmax, 6), np.float32),
        "torsion_phase": np.zeros((S, Tmax, 6), np.float32),
        "torsion_mask": np.zeros((S, Tmax), bool),
    }
    for s, t in enumerate(terms):
        ni = t.improper_idx.shape[0]
        nt = t.torsion_idx.shape[0]
        if ni:
            out["improper_idx"][s, :ni] = t.improper_idx
            out["improper_k"][s, :ni] = t.improper_k
            out["improper_mask"][s, :ni] = True
        if nt:
            out["torsion_idx"][s, :nt] = t.torsion_idx
            out["torsion_coeffs"][s, :nt] = t.torsion_coeffs
            out["torsion_phase"][s, :nt] = t.torsion_phase
            out["torsion_mask"][s, :nt] = True
    return out


def _gather_quads(pos3, idx):
    """pos3 [S, A, 3], idx [S, K, 4] -> [S, K, 4, 3].

    One-hot einsum, NOT an elementwise gather: dynamic-index gathers
    lower to serialized loops on TPU and their autodiff transpose is a
    scatter-add (see models/terms.select_slots — the flat-gather form of
    this function cost ~2/3 of embed's end-to-end wall time). The bf16
    one-hot is exact (entries 0/1) and the contraction accumulates f32.
    """
    A = pos3.shape[1]
    # accumulate in the position dtype (f64 validation mode stays f64)
    oh_dt = jnp.bfloat16 if pos3.dtype == jnp.float32 else pos3.dtype
    oh = jax.nn.one_hot(idx, A, dtype=oh_dt)             # [S, K, 4, A]
    return jnp.einsum(
        "skqa,sad->skqd", oh, pos3, preferred_element_type=pos3.dtype
    )


def etk_energy(
    positions,        # [S, A, 3]
    ub2, lb2, pair_mask,
    etk: dict,
    bounds_weight: float = 1.0,
) -> jnp.ndarray:
    """Per-system ETK 3-D energies."""
    zero_c = jnp.zeros((positions.shape[0], 1, 4), jnp.int32)
    e = bounds_weight * dg_energy(
        positions, ub2, lb2, pair_mask,
        zero_c, jnp.zeros((positions.shape[0], 1)), jnp.zeros((positions.shape[0], 1)),
        jnp.zeros((positions.shape[0], 1), bool),
        chiral_weight=0.0, fourth_dim_weight=0.0,
    )

    # improper planarity
    pts = _gather_quads(positions, etk["improper_idx"])  # [S, I, 4, 3]
    mask = etk["improper_mask"]
    rji = pts[:, :, 0] - pts[:, :, 1]
    rjk = pts[:, :, 2] - pts[:, :, 1]
    rjl = pts[:, :, 3] - pts[:, :, 1]
    rji = jnp.where(mask[..., None], rji, jnp.asarray([1.0, 0, 0]))
    rjk = jnp.where(mask[..., None], rjk, jnp.asarray([0, 1.0, 0]))
    rjl = jnp.where(mask[..., None], rjl, jnp.asarray([1.0, 0, 0]))
    n = jnp.cross(rji, rjk)
    nn = jnp.sqrt(jnp.sum(n * n, -1) + 1e-10)
    nl = jnp.sqrt(jnp.sum(rjl * rjl, -1) + 1e-10)
    sin_w = jnp.clip(jnp.sum(n * rjl, -1) / (nn * nl), -1.0, 1.0)
    cos_w = jnp.sqrt(jnp.clip(1.0 - sin_w * sin_w, 1e-10, 1.0))
    e = e + jnp.sum(
        jnp.where(mask, etk["improper_k"] * (1.0 - cos_w), 0.0), axis=1
    )

    # experimental torsions
    pts = _gather_quads(positions, etk["torsion_idx"])  # [S, T, 4, 3]
    tmask = etk["torsion_mask"]
    b1 = pts[:, :, 1] - pts[:, :, 0]
    b2 = pts[:, :, 2] - pts[:, :, 1]
    b3 = pts[:, :, 3] - pts[:, :, 2]
    b1 = jnp.where(tmask[..., None], b1, jnp.asarray([1.0, 0, 0]))
    b2 = jnp.where(tmask[..., None], b2, jnp.asarray([0, 1.0, 0]))
    b3 = jnp.where(tmask[..., None], b3, jnp.asarray([0, 0, 1.0]))
    n1 = jnp.cross(b1, b2)
    n2 = jnp.cross(b2, b3)
    m1 = jnp.cross(n1, b2 / jnp.linalg.norm(b2, axis=-1, keepdims=True).clip(1e-9))
    phi = jnp.arctan2(jnp.sum(m1 * n2, -1), jnp.sum(n1 * n2, -1))  # [S, T]
    k_idx = jnp.arange(1, 7, dtype=positions.dtype)
    tor = jnp.sum(
        etk["torsion_coeffs"]
        * (1.0 + jnp.cos(k_idx * phi[..., None] - etk["torsion_phase"])),
        axis=-1,
    )
    e = e + jnp.sum(jnp.where(tmask, tor, 0.0), axis=1)
    return e


@functools.partial(jax.jit, static_argnames=("bounds_weight",))
def etk_energy_and_grad(
    positions, ub2, lb2, pair_mask, etk, atom_mask, *, bounds_weight: float = 1.0
):
    def total(p):
        e = etk_energy(p, ub2, lb2, pair_mask, etk, bounds_weight)
        return jnp.sum(e), e

    (_, e), g = jax.value_and_grad(total, has_aux=True)(positions)
    g = jnp.where(atom_mask[..., None], g, 0.0)
    return e, g


def etk_eg(positions, args: dict):
    """Args-pytree form for the jit-cached BFGS fast path."""
    def total(p):
        e = etk_energy(
            p, args["ub2"], args["lb2"], args["pair_mask"], args["etk"],
            args["bounds_weight"],
        )
        return jnp.sum(e), e

    (_, e), g = jax.value_and_grad(total, has_aux=True)(positions)
    g = jnp.where(args["atom_mask"][..., None], g, 0.0)
    return e, g
