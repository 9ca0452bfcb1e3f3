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


def build_etk_terms(
    mol: Mol, torsion_provider=None, force_trans_amides: bool = False
) -> ETKTermsHost:
    """Improper (planarity) terms from the graph; experimental-torsion
    terms from ``torsion_provider(mol) -> (idx, coeffs, phase)`` if
    given; with ``force_trans_amides``, an omega-torsion pin per amide
    bond (RDKit's ``forceTransAmides`` — RDKit clamps the 1-4 bounds,
    here it is an ETK torsion with its minimum at omega=180).

    Results cache on the Mol keyed by (provider identity, flag) — the
    reference caches per-ROMol contribs the same way
    (``bfgs_mmff.cpp:199``); editing the Mol's graph afterwards requires
    a fresh Mol or deleting ``_etk_terms_cache``.
    """
    cache = getattr(mol, "_etk_terms_cache", None)
    if (
        cache is not None
        and cache[0] is torsion_provider
        and len(cache) == 3
        and cache[2] == force_trans_amides
    ):
        return cache[1]
    out = _build_etk_terms_uncached(mol, torsion_provider, force_trans_amides)
    mol._etk_terms_cache = (torsion_provider, out, force_trans_amides)
    return out


def _hyb_from_flat(n, arom, ba, bt) -> np.ndarray:
    """[n] int8: 3=sp3, 2=sp2 (incl aromatic), 1=sp — vectorized;
    semantics of ``uff.builder._hybridization`` (the per-atom oracle,
    differential-tested). Works on one molecule or a concatenation
    with offset bond ids."""
    n_double = np.bincount(ba[bt == 2].ravel(), minlength=max(n, 1))[:n]
    n_triple = np.bincount(ba[bt == 3].ravel(), minlength=max(n, 1))[:n]
    hyb = np.full(n, 3, np.int8)
    hyb[n_double > 0] = 2
    hyb[(n_triple > 0) | (n_double >= 2)] = 1
    hyb[arom] = 2
    return hyb


def _hybridization_array(mol: Mol) -> np.ndarray:
    cached = getattr(mol, "_hyb_cache", None)
    if cached is not None:
        return cached
    arrays = mol.to_arrays()
    hyb = _hyb_from_flat(
        mol.num_atoms,
        np.asarray(arrays["is_aromatic"]).astype(bool),
        np.asarray(arrays["bond_atoms"]).reshape(-1, 2),
        np.asarray(arrays["bond_type"]).reshape(-1),
    )
    mol._hyb_cache = hyb
    return hyb


def hybridization_batch(mols: list[Mol]) -> None:
    """Fill ``_hyb_cache`` for every molecule with ONE vectorized pass
    over the concatenated graph (per-molecule numpy overhead at ~12
    atoms costs more than the loops it replaces — same batching as
    ``chem.bounds._uff_geom_arrays_batch``)."""
    todo = [m for m in mols if getattr(m, "_hyb_cache", None) is None]
    if not todo:
        return
    arom_parts, ba_parts, bt_parts, na_list = [], [], [], []
    off = 0
    for m in todo:
        arrays = m.to_arrays()
        arom_parts.append(np.asarray(arrays["is_aromatic"]).astype(bool))
        ba_parts.append(np.asarray(arrays["bond_atoms"]).reshape(-1, 2) + off)
        bt_parts.append(np.asarray(arrays["bond_type"]).reshape(-1))
        na_list.append(m.num_atoms)
        off += m.num_atoms
    hyb = _hyb_from_flat(
        off,
        np.concatenate(arom_parts),
        np.concatenate(ba_parts) if ba_parts else np.zeros((0, 2), np.int64),
        np.concatenate(bt_parts) if bt_parts else np.zeros(0, np.int32),
    )
    a0 = 0
    for m, na in zip(todo, na_list):
        m._hyb_cache = hyb[a0 : a0 + na]
        a0 += na


def _build_etk_terms_uncached(
    mol: Mol, torsion_provider=None, force_trans_amides: bool = False
) -> ETKTermsHost:
    arrays = mol.to_arrays()
    hyb = _hybridization_array(mol)
    z = np.asarray(arrays["atomic_num"])
    degree = np.asarray(arrays["degree"])
    adj_atoms = np.asarray(arrays["adj_atoms"])          # [n, 8], -1 pads

    centers = np.nonzero(
        (degree == 3) & ((z == 6) | (z == 7)) & (hyb == 2)
    )[0]
    if len(centers):
        nb = adj_atoms[centers]
        imp_idx = np.stack(
            [nb[:, 0], centers, nb[:, 1], nb[:, 2]], axis=1
        ).astype(np.int32)
        imp_k = np.full(len(centers), 10.0, np.float32)
    else:
        imp_idx = np.zeros((0, 4), np.int32)
        imp_k = np.zeros(0, np.float32)

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
    bt_arr = np.asarray(arrays["bond_type"]).reshape(-1)
    ba_arr = np.asarray(arrays["bond_atoms"]).reshape(-1, 2)
    pin = (bt_arr == 4) | (bt_arr >= 2)
    if pin.any():
        je, ke = ba_arr[:, 0], ba_arr[:, 1]
        pin &= (hyb[je] == 2) & (hyb[ke] == 2)
        pin &= (degree[je] >= 2) & (degree[ke] >= 2)
    _planar_c = np.zeros(6, np.float32)
    _planar_p = np.zeros(6, np.float32)
    _planar_c[1] = 5.0
    _planar_p[1] = np.pi
    for bi in np.nonzero(pin)[0]:
        j, k = int(ba_arr[bi, 0]), int(ba_arr[bi, 1])
        for i in adj_atoms[j]:
            if i < 0 or i == k:
                continue
            for l in adj_atoms[k]:
                if l < 0 or l == j or l == i:
                    continue
                t_rows.append((int(i), j, k, int(l)))
                t_c.append(_planar_c)
                t_p.append(_planar_p)

    if torsion_provider is not None:
        p_idx, p_coeffs, p_phase = torsion_provider(mol)
        for r in range(len(p_idx)):
            t_rows.append(tuple(int(x) for x in p_idx[r]))
            t_c.append(np.asarray(p_coeffs[r], np.float32))
            t_p.append(np.asarray(p_phase[r], np.float32))

    if force_trans_amides:
        # omega pin per amide bond C(=O)-N: quartet (Ca, C, N, Cb) with
        # E = F (1 + cos omega), minimum at omega = 180 (trans). Ca is
        # a heavy C-neighbor that is not the carbonyl O or the amide N;
        # Cb a heavy N-neighbor that is not C. Skips formamide-like
        # ends with no heavy flanking atoms.
        for b in mol.bonds:
            for c_at, n_at in ((b.begin, b.end), (b.end, b.begin)):
                if b.order != 1 or b.is_aromatic:
                    continue
                if mol.atoms[c_at].atomic_num != 6:
                    continue
                if mol.atoms[n_at].atomic_num != 7:
                    continue
                o_at = next(
                    (
                        nb for nb in mol.neighbors(c_at)
                        if mol.atoms[nb].atomic_num == 8
                        and (bo := mol.bond_between(c_at, nb)) is not None
                        and bo.order == 2
                    ),
                    None,
                )
                if o_at is None:
                    continue
                ca = next(
                    (
                        nb for nb in mol.neighbors(c_at)
                        if nb not in (o_at, n_at)
                        and mol.atoms[nb].atomic_num > 1
                    ),
                    None,
                )
                cb = next(
                    (
                        nb for nb in mol.neighbors(n_at)
                        if nb != c_at and mol.atoms[nb].atomic_num > 1
                    ),
                    None,
                )
                if ca is None or cb is None:
                    continue
                coeffs = np.zeros(6, np.float32)
                phase = np.zeros(6, np.float32)
                coeffs[0] = 10.0  # strong omega pin
                phase[0] = 0.0    # E = F (1 + cos w): min at w = pi
                t_rows.append((ca, c_at, n_at, cb))
                t_c.append(coeffs)
                t_p.append(phase)

    if t_rows:
        t_idx = np.asarray(t_rows, np.int32)
        t_coeffs = np.stack(t_c)
        t_phase = np.stack(t_p)
    else:
        t_idx = np.zeros((0, 4), np.int32)
        t_coeffs = np.zeros((0, 6), np.float32)
        t_phase = np.zeros((0, 6), np.float32)

    return ETKTermsHost(
        improper_idx=np.asarray(imp_idx, np.int32).reshape(-1, 4),
        improper_k=np.asarray(imp_k, np.float32),
        torsion_idx=np.asarray(t_idx, np.int32).reshape(-1, 4),
        torsion_coeffs=np.asarray(t_coeffs, np.float32).reshape(-1, 6),
        torsion_phase=np.asarray(t_phase, np.float32).reshape(-1, 6),
    )


def build_etk_terms_batch(
    mols: list[Mol], torsion_provider=None, force_trans_amides: bool = False
) -> list[ETKTermsHost]:
    """Whole-batch ETK term assembly: ONE vectorized pass over the
    concatenated graph for impropers and planarity torsions, then
    per-molecule slicing. Emission order per molecule is identical to
    :func:`build_etk_terms` (bond-ascending, adjacency-slot-ordered
    combos, provider claims after the planarity rows — the per-mol
    builder stays as the differential oracle). Results cache per Mol
    exactly like the per-mol path."""
    need = [
        m for m in mols
        if not (
            (c := getattr(m, "_etk_terms_cache", None)) is not None
            and c[0] is torsion_provider
            and len(c) == 3
            and c[2] == force_trans_amides
        )
    ]
    if need:
        hybridization_batch(need)
        z_p, deg_p, adj_p, ba_p, bt_p, hyb_p = [], [], [], [], [], []
        na_list = []
        off = 0
        for m in need:
            arrays = m.to_arrays()
            na = m.num_atoms
            z_p.append(np.asarray(arrays["atomic_num"], np.int32))
            deg_p.append(np.asarray(arrays["degree"], np.int32))
            adj = np.asarray(arrays["adj_atoms"], np.int64).copy()
            adj[adj >= 0] += off
            adj_p.append(adj)
            ba_p.append(np.asarray(arrays["bond_atoms"], np.int64) + off)
            bt_p.append(np.asarray(arrays["bond_type"]).reshape(-1))
            hyb_p.append(m._hyb_cache)
            na_list.append(na)
            off += na
        z = np.concatenate(z_p)
        degree = np.concatenate(deg_p)
        adjcat = np.concatenate(adj_p, axis=0)
        ba = (
            np.concatenate(ba_p, axis=0).reshape(-1, 2)
            if ba_p else np.zeros((0, 2), np.int64)
        )
        bt = np.concatenate(bt_p) if bt_p else np.zeros(0, np.int32)
        hyb = np.concatenate(hyb_p)
        atom_off = np.zeros(len(need) + 1, np.int64)
        np.cumsum(na_list, out=atom_off[1:])

        # impropers (centers ascend with the concatenation => grouped
        # per molecule)
        centers = np.nonzero(
            (degree == 3) & ((z == 6) | (z == 7)) & (hyb == 2)
        )[0]
        nbc = adjcat[centers]
        imp_all = np.stack(
            [nbc[:, 0], centers, nbc[:, 1], nbc[:, 2]], axis=1
        ).astype(np.int64) if len(centers) else np.zeros((0, 4), np.int64)
        imp_split = np.searchsorted(centers, atom_off)

        # planarity torsions: all (i, j, k, l) combos of pinned bonds,
        # emitted in (bond, i-slot, l-slot) order == the oracle's
        pin = (bt >= 2) & (hyb[ba[:, 0]] == 2) & (hyb[ba[:, 1]] == 2)
        pin &= (degree[ba[:, 0]] >= 2) & (degree[ba[:, 1]] >= 2)
        pb = np.nonzero(pin)[0]
        if len(pb):
            je, ke = ba[pb, 0], ba[pb, 1]           # [B]
            ic = adjcat[je]                          # [B, 8]
            lc = adjcat[ke]
            okm = (
                (ic[:, :, None] >= 0)
                & (lc[:, None, :] >= 0)
                & (ic[:, :, None] != ke[:, None, None])
                & (lc[:, None, :] != je[:, None, None])
                & (ic[:, :, None] != lc[:, None, :])
            )                                        # [B, 8, 8]
            wb, wi, wl = np.nonzero(okm)
            tor_all = np.stack(
                [ic[wb, wi], je[wb], ke[wb], lc[wb, wl]], axis=1
            )                                        # [T, 4] global ids
            tor_mol = np.searchsorted(atom_off, je[wb], side="right") - 1
            tor_split = np.searchsorted(tor_mol, np.arange(len(need) + 1))
        else:
            tor_all = np.zeros((0, 4), np.int64)
            tor_split = np.zeros(len(need) + 1, np.int64)

        planar_c = np.zeros(6, np.float32)
        planar_p = np.zeros(6, np.float32)
        planar_c[1] = 5.0
        planar_p[1] = np.pi

        for k, m in enumerate(need):
            a0 = atom_off[k]
            imp = (imp_all[imp_split[k] : imp_split[k + 1]] - a0).astype(np.int32)
            tor = (tor_all[tor_split[k] : tor_split[k + 1]] - a0).astype(np.int32)
            n_t = len(tor)
            t_idx = [tor]
            t_c = [np.broadcast_to(planar_c, (n_t, 6))]
            t_p = [np.broadcast_to(planar_p, (n_t, 6))]
            if torsion_provider is not None:
                p_idx, p_coeffs, p_phase = torsion_provider(m)
                if len(p_idx):
                    t_idx.append(np.asarray(p_idx, np.int32).reshape(-1, 4))
                    t_c.append(np.asarray(p_coeffs, np.float32).reshape(-1, 6))
                    t_p.append(np.asarray(p_phase, np.float32).reshape(-1, 6))
            if force_trans_amides:
                # rare path: reuse the oracle for the amide scan
                oracle = _build_etk_terms_uncached(
                    m, torsion_provider, force_trans_amides
                )
                m._etk_terms_cache = (torsion_provider, oracle, True)
                continue
            terms = ETKTermsHost(
                improper_idx=imp.reshape(-1, 4),
                improper_k=np.full(len(imp), 10.0, np.float32),
                torsion_idx=np.concatenate(t_idx, axis=0),
                torsion_coeffs=np.concatenate(t_c, axis=0),
                torsion_phase=np.concatenate(t_p, axis=0),
            )
            m._etk_terms_cache = (torsion_provider, terms, False)
    return [build_etk_terms(m, torsion_provider, force_trans_amides) for m in mols]


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
        # coeffs/phases [S, 6, T]: k harmonics on SUBLANES, terms on
        # LANES (a trailing 6-axis pads every TPU tile to 128 lanes)
        "torsion_coeffs": np.zeros((S, 6, Tmax), np.float32),
        "torsion_phase": np.zeros((S, 6, Tmax), np.float32),
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
            out["torsion_coeffs"][s, :, :nt] = t.torsion_coeffs.T
            out["torsion_phase"][s, :, :nt] = t.torsion_phase.T
            out["torsion_mask"][s, :nt] = True
    return out


# Term math runs in [S, 3, K] layout — xyz on the SUBLANE axis, terms
# on the LANE axis — exactly like the MMFF/UFF bonded paths: a trailing
# axis of 3 pads every (8, 128) TPU tile to 128 lanes (~42x waste on
# all intermediates), and per-slot one-hot matmuls put 3 output lanes
# on the 128-lane MXU. The improper and torsion quads share ONE merged
# selection dot (models/terms.select_slots) over a precomputed bf16
# one-hot (etk["sel_oh"], built once per batch by attach_etk_selection;
# rebuilt on the fly if a caller passes a bare padded dict).

_UX = np.asarray([1.0, 0.0, 0.0], np.float32).reshape(1, 3, 1)
_UY = np.asarray([0.0, 1.0, 0.0], np.float32).reshape(1, 3, 1)
_UZ = np.asarray([0.0, 0.0, 1.0], np.float32).reshape(1, 3, 1)


def _safe3(d, mask, unit):
    return jnp.where(mask[:, None, :], d, unit.astype(d.dtype))


def _norm1(d):
    return jnp.sqrt(jnp.sum(d * d, axis=1) + 1e-10)


def _cross1(u, v):
    return jnp.cross(u, v, axisa=1, axisb=1, axisc=1)


def attach_etk_selection(etk: dict, max_atoms: int) -> dict:
    """Add the merged selection tables to a (device) padded ETK batch:
    "sel_idx" [S, I+T, 4] int32 (impropers first) and "sel_oh", the
    merged bf16 one-hot from models/terms.slot_onehots_device. Called
    once per batch so the per-step energy eval only runs the selection
    dot; without it etk_energy rebuilds both every call."""
    from nvmolkit_tpu.models.terms import slot_onehots_device

    sel_idx = jnp.concatenate(
        [jnp.asarray(etk["improper_idx"]), jnp.asarray(etk["torsion_idx"])], axis=1
    )
    return {
        **etk,
        "sel_idx": sel_idx,
        "sel_oh": slot_onehots_device(sel_idx, max_atoms),
    }


def etk_energy(
    positions,        # [S, A, 3]
    ub2, lb2, pair_mask,
    etk: dict,
    bounds_weight: float = 1.0,
) -> jnp.ndarray:
    """Per-system ETK 3-D energies."""
    from nvmolkit_tpu.models.terms import select_slots, slot_onehots_device

    S, A, _ = positions.shape
    zero_c = jnp.zeros((S, 1, 4), jnp.int32)
    e = bounds_weight * dg_energy(
        positions, ub2, lb2, pair_mask,
        zero_c, jnp.zeros((S, 1)), jnp.zeros((S, 1)),
        jnp.zeros((S, 1), bool),
        chiral_weight=0.0, fourth_dim_weight=0.0,
    )

    sel_idx = etk.get("sel_idx")
    if sel_idx is None:
        sel_idx = jnp.concatenate([etk["improper_idx"], etk["torsion_idx"]], axis=1)
    oh = etk.get("sel_oh")
    if oh is None:
        oh = slot_onehots_device(sel_idx, A)
    I = etk["improper_idx"].shape[1]
    slots = select_slots(positions, sel_idx, oh)  # [4, S, 3, I+T]

    # improper planarity: E = k (1 - cos w), sin w = n.rjl / (|n||rjl|)
    mask = etk["improper_mask"]
    rji = _safe3(slots[0, :, :, :I] - slots[1, :, :, :I], mask, _UX)
    rjk = _safe3(slots[2, :, :, :I] - slots[1, :, :, :I], mask, _UY)
    rjl = _safe3(slots[3, :, :, :I] - slots[1, :, :, :I], mask, _UX)
    n = _cross1(rji, rjk)
    sin_w = jnp.clip(
        jnp.sum(n * rjl, axis=1) / (_norm1(n) * _norm1(rjl)), -1.0, 1.0
    )
    cos_w = jnp.sqrt(jnp.clip(1.0 - sin_w * sin_w, 1e-10, 1.0))
    e = e + jnp.sum(
        jnp.where(mask, etk["improper_k"] * (1.0 - cos_w), 0.0), axis=1
    )

    # experimental torsions: E = sum_k F_k (1 + cos(k phi - phi0_k)).
    # coeffs/phases are stored [S, 6, T] (k on sublanes, terms on lanes)
    # and the k-sum is unrolled — a trailing 6-axis would pad to 128.
    tmask = etk["torsion_mask"]
    b1 = _safe3(slots[1, :, :, I:] - slots[0, :, :, I:], tmask, _UX)
    b2 = _safe3(slots[2, :, :, I:] - slots[1, :, :, I:], tmask, _UY)
    b3 = _safe3(slots[3, :, :, I:] - slots[2, :, :, I:], tmask, _UZ)
    n1 = _cross1(b1, b2)
    n2 = _cross1(b2, b3)
    m1 = _cross1(n1, b2 / _norm1(b2)[:, None, :])
    phi = jnp.arctan2(jnp.sum(m1 * n2, axis=1), jnp.sum(n1 * n2, axis=1))  # [S, T]
    coeffs, phase = etk["torsion_coeffs"], etk["torsion_phase"]
    tor = None
    for k in range(1, 7):
        term = coeffs[:, k - 1, :] * (1.0 + jnp.cos(k * phi - phase[:, k - 1, :]))
        tor = term if tor is None else tor + term
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
