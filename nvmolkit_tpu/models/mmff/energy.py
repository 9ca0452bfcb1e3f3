"""MMFF94 batched energy — exact published functional forms, TPU-fast layout.

Replaces the reference's per-term CUDA kernels
(``src/forcefields/mmff_kernels_device.cuh``); gradients via autodiff.
Same layout strategy as :mod:`nvmolkit_tpu.models.uff.energy`: bonded
terms ride fused one-hot matmul selections; nonbonded (buffered 14-7
vdW + buffered electrostatics) are dense masked pairwise computations
with squared distances from direct coordinate diffs (VPU-exact).

  bond stretch   E = 143.9325/2 kb dr^2 (1 + cs dr + 7/12 cs^2 dr^2),
                 cs = -2 A^-1
  angle bend     E = 0.043844/2 ka dt^2 (1 + cb dt), cb = -0.007 deg^-1
                 linear: E = 143.9325 ka (1 + cos theta)
  stretch-bend   E = 2.51210 (kba_ijk dr_ij + kba_kji dr_kj) dt
  out-of-plane   E = 0.043844/2 koop chi^2 (Wilson angle, degrees)
  torsion        E = 0.5 (V1(1+cos p) + V2(1-cos 2p) + V3(1+cos 3p))
  vdW (buf 14-7) E = eps (1.07 R*/(R+0.07R*))^7 (1.12 R*^7/(R^7+0.12R*^7) - 2)
  electrostatic  E = 332.0716 qq scale / (D (R + 0.05)^n), scale 0.75 on 1-4
"""
from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from nvmolkit_tpu.chem.mol import Mol
from nvmolkit_tpu.models.mmff.terms import MMFFProperties, MMFFTerms
from nvmolkit_tpu.models.terms import (
    batch_terms_per_system,
    select_slots,
    slot_onehots_device,
)

_EPS = 1e-10
_DEG = 180.0 / np.pi
_CS = -2.0
_CB = -0.006981317

_BONDED_KINDS = ("bonds", "angles", "stretch_bends", "oop", "torsions")


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class MMFFBatch:
    """Nonbonded pair tables are stored FLATTENED to [S, A*A]: with small
    buckets (A=32) a trailing axis of A wastes 3/4 of every (8, 128) TPU
    tile, while A*A tiles exactly. Pair (i, j) lives at flat index
    i*A + j. Masking is folded into the parameters (eps/qq zero where
    inactive) so the hot path carries no separate mask tensor."""

    n_systems: int
    max_atoms: int
    diel_constant: float
    diel_model: int
    offsets: tuple                 # ((kind, start, count), ...) static
    atom_mask: jnp.ndarray         # [S, A]
    sel_idx: jnp.ndarray           # [S, T_all, 4] int32 fused term atoms
    onehot: jnp.ndarray            # [S, 4*T_all, A] bf16 merged
    tables: dict[str, dict[str, jnp.ndarray]]
    nb_rstar: jnp.ndarray          # [S, A*A] pair R* (0 where inactive)
    nb_eps: jnp.ndarray            # [S, A*A] pair eps (0 where inactive)
    nb_qq_scale: jnp.ndarray       # [S, A*A] qq * (0.75 if 1-4) else 0

    def tree_flatten(self):
        children = (
            self.atom_mask, self.sel_idx, self.onehot, self.tables,
            self.nb_rstar, self.nb_eps, self.nb_qq_scale,
        )
        aux = (
            self.n_systems, self.max_atoms, self.diel_constant,
            self.diel_model, self.offsets,
        )
        return children, aux

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*aux, *children)


def batch_mmff_terms(
    terms: list[MMFFTerms],
    n_atoms: list[int],
    max_atoms: int,
    properties: MMFFProperties | None = None,
) -> MMFFBatch:
    props = properties or MMFFProperties()
    S, A = len(terms), max_atoms
    atom_mask = np.zeros((S, A), bool)
    for s, na in enumerate(n_atoms):
        if na > A:
            raise ValueError(f"system {s}: {na} atoms > bucket {A}")
        atom_mask[s, :na] = True

    enabled = {
        "bonds": props.bondTerm,
        "angles": props.angleTerm,
        "stretch_bends": props.stretchBendTerm,
        "oop": props.oopTerm,
        "torsions": props.torsionTerm,
    }
    tables: dict[str, dict[str, jnp.ndarray]] = {}
    fused_idx, offsets, cursor = [], [], 0
    for kind in _BONDED_KINDS:
        if not enabled[kind]:
            continue
        per_sys = batch_terms_per_system([getattr(t, kind) for t in terms])
        idx = per_sys.pop("idx")
        tk, arity = idx.shape[1], idx.shape[2]
        if arity < 4:
            idx = np.concatenate([idx, np.zeros((S, tk, 4 - arity), np.int32)], axis=2)
        fused_idx.append(idx)
        offsets.append((kind, cursor, tk))
        cursor += tk
        tables[kind] = {
            "mask": jnp.asarray(per_sys.pop("mask")),
            **{k: jnp.asarray(v) for k, v in per_sys.items()},
        }
    if fused_idx:
        sel_idx = np.concatenate(fused_idx, axis=1)
    else:
        sel_idx = np.zeros((S, 1, 4), np.int32)
    sel_idx = jnp.asarray(sel_idx)
    onehot = slot_onehots_device(sel_idx, A)

    # flattened nonbonded pair tables (see MMFFBatch docstring)
    nb_rstar = np.zeros((S, A * A), np.float32)
    nb_eps = np.zeros((S, A * A), np.float32)
    nb_qq_scale = np.zeros((S, A * A), np.float32)
    if props.vdWTerm:
        for s, t in enumerate(terms):
            v = t.vdw
            if v.n_terms:
                flat = v.atoms[:, 0] * A + v.atoms[:, 1]
                nb_rstar[s, flat] = v.params["rstar"]
                nb_eps[s, flat] = v.params["eps"]
    if props.eleTerm:
        for s, t in enumerate(terms):
            e = t.ele
            if e.n_terms:
                flat = e.atoms[:, 0] * A + e.atoms[:, 1]
                scale = np.where(e.params["is_1_4"] > 0.5, 0.75, 1.0)
                nb_qq_scale[s, flat] = e.params["qq"] * scale

    return MMFFBatch(
        n_systems=S,
        max_atoms=A,
        diel_constant=props.dielConstant,
        diel_model=props.dielModel,
        offsets=tuple(offsets),
        atom_mask=jnp.asarray(atom_mask),
        sel_idx=sel_idx,
        onehot=onehot,
        tables=tables,
        nb_rstar=jnp.asarray(nb_rstar),
        nb_eps=jnp.asarray(nb_eps),
        nb_qq_scale=jnp.asarray(nb_qq_scale),
    )


# Batch-level cache: repeated optimize calls over the SAME molecule
# list (conformer pipelines re-minimizing a set, throughput loops) skip
# the numpy padding/packing entirely and reuse the device-resident
# MMFFBatch.
from nvmolkit_tpu.models.terms import BoundedBatchCache

_BATCH_CACHE = BoundedBatchCache()


def make_batched_mmff(
    mols: list[Mol],
    max_atoms: int,
    properties: MMFFProperties | None = None,
    provider=None,
) -> MMFFBatch:
    """Build and batch MMFF terms for a bucket of molecules.

    Per-molecule parametrization is cached on the Mol object (the
    reference caches contribs per ROMol*, ``bfgs_mmff.cpp:199``), keyed
    by provider + the MMFFProperties knobs that affect term building;
    the fully-batched device tables additionally cache per molecule
    LIST. Editing a Mol's graph after the first use requires a fresh
    Mol (or deleting ``_mmff_terms_cache``).
    """
    from nvmolkit_tpu.models.mmff.providers import default_provider

    provider = provider or default_provider()
    props = properties or MMFFProperties()
    key = (
        getattr(provider, "cache_key", type(provider).__name__),
        props.mmffVariant,
        props.nonBondedThreshold,
        props.ignoreInterfragInteractions,
    )
    batch_key = (
        tuple(id(m) for m in mols), max_atoms, key,
        tuple(sorted(vars(props).items())),
    )
    hit = _BATCH_CACHE.get(batch_key)
    if hit is not None:
        return hit
    terms = []
    for m in mols:
        cache = getattr(m, "_mmff_terms_cache", None)
        if cache is None or cache[0] != key:
            cache = (key, provider.build_terms(m, props))
            m._mmff_terms_cache = cache
        terms.append(cache[1])
    batch = batch_mmff_terms(terms, [m.num_atoms for m in mols], max_atoms, props)
    _BATCH_CACHE.put(batch_key, mols, batch)
    return batch


# Term math runs in [S, 3, T] layout: xyz on the sublane axis, terms on
# the lane axis (see models/terms.select_slots). Unit fallbacks keep
# masked rows finite through norms/arccos.
_EX = np.asarray([1.0, 0.0, 0.0], np.float32).reshape(1, 3, 1)
_EY = np.asarray([0.0, 1.0, 0.0], np.float32).reshape(1, 3, 1)
_EZ = np.asarray([0.0, 0.0, 1.0], np.float32).reshape(1, 3, 1)


def _safe(d, mask, unit):
    return jnp.where(mask[:, None, :], d, unit.astype(d.dtype))


def _norm(d):
    return jnp.sqrt(jnp.sum(d * d, axis=1) + _EPS)


# arccos/arcsin clip bound: strictly INSIDE [-1, 1]. At |c| == 1 the
# derivative of arccos/arcsin is infinite, so clipping to the closed
# interval poisons the gradient of any term that hits the bound (linear
# angles, planar impropers) with inf -> NaN; round-4 profiling found
# ~4% of embedded drug-like start geometries carried a NaN gradient
# from exactly this, and every such system burned its line search to
# the failure cap. 1 - 2^-20 keeps the angle error < 0.08 deg while
# bounding |d arccos/dc| at ~724.
_CLIP = 1.0 - 1.0 / (1 << 20)


def _dot(u, v):
    return jnp.sum(u * v, axis=1)


def _cross(u, v):
    return jnp.cross(u, v, axisa=1, axisb=1, axisc=1)


def _bond(p, t):
    d = _safe(p[0] - p[1], t["mask"], _EX)
    dr = _norm(d) - t["r0"]
    e = (
        0.5 * 143.9325 * t["kb"] * dr * dr
        * (1.0 + _CS * dr + (7.0 / 12.0) * _CS * _CS * dr * dr)
    )
    return jnp.where(t["mask"], e, 0.0)


def _angle(p, t):
    u = _safe(p[0] - p[1], t["mask"], _EX)
    v = _safe(p[2] - p[1], t["mask"], _EY)
    cos = jnp.clip(_dot(u, v) / (_norm(u) * _norm(v)), -_CLIP, _CLIP)
    theta = jnp.arccos(cos) * _DEG
    dt = theta - t["theta0"]
    bent = 0.5 * 0.043844 * t["ka"] * dt * dt * (1.0 + _CB * dt)
    linear = 143.9325 * t["ka"] * (1.0 + cos)
    e = jnp.where(t["is_linear"] > 0.5, linear, bent)
    return jnp.where(t["mask"], e, 0.0)


def _stretch_bend(p, t):
    u = _safe(p[0] - p[1], t["mask"], _EX)
    v = _safe(p[2] - p[1], t["mask"], _EY)
    rij = _norm(u)
    rkj = _norm(v)
    cos = jnp.clip(_dot(u, v) / (rij * rkj), -_CLIP, _CLIP)
    dt = jnp.arccos(cos) * _DEG - t["theta0"]
    e = 2.51210 * (
        t["kba_ijk"] * (rij - t["r0_ij"]) + t["kba_kji"] * (rkj - t["r0_kj"])
    ) * dt
    return jnp.where(t["mask"], e, 0.0)


def _oop(p, t):
    rji = _safe(p[0] - p[1], t["mask"], _EX)
    rjk = _safe(p[2] - p[1], t["mask"], _EY)
    rjl = _safe(p[3] - p[1], t["mask"], _EZ)
    n = _cross(rji, rjk)
    sin_chi = jnp.clip(_dot(n, rjl) / (_norm(n) * _norm(rjl)), -_CLIP, _CLIP)
    chi = jnp.arcsin(sin_chi) * _DEG
    e = 0.5 * 0.043844 * t["koop"] * chi * chi
    return jnp.where(t["mask"], e, 0.0)


def _torsion(p, t):
    b1 = _safe(p[1] - p[0], t["mask"], _EX)
    b2 = _safe(p[2] - p[1], t["mask"], _EY)
    b3 = _safe(p[3] - p[2], t["mask"], _EZ)
    n1 = _cross(b1, b2)
    n2 = _cross(b2, b3)
    c = jnp.clip(_dot(n1, n2) / (_norm(n1) * _norm(n2)), -1.0, 1.0)
    cos2 = 2.0 * c * c - 1.0
    cos3 = c * (2.0 * cos2 - 1.0)
    e = 0.5 * (
        t["v1"] * (1.0 + c) + t["v2"] * (1.0 - cos2) + t["v3"] * (1.0 + cos3)
    )
    return jnp.where(t["mask"], e, 0.0)


_BONDED = {
    "bonds": _bond,
    "angles": _angle,
    "stretch_bends": _stretch_bend,
    "oop": _oop,
    "torsions": _torsion,
}


def _nonbonded_dense(positions, batch: MMFFBatch) -> jnp.ndarray:
    S, A = positions.shape[0], positions.shape[1]
    # Pairwise r^2 via direct per-coordinate differences on the VPU.
    # The Gram-matmul form (||a||^2 + ||b||^2 - 2 a.b) needs a K=3
    # contraction (3 of 128 MXU lanes), costs 6 emulation passes under
    # exact-f32 precision, and cancels catastrophically for close pairs.
    # Splitting coordinates into three [S, A] planes (instead of one
    # [S, 3, A, A] diff tensor whose 3-sublane axis pads 8x) measured
    # another ~20% off the in-loop step: exact, no cancellation.
    x, y, z = positions[..., 0], positions[..., 1], positions[..., 2]
    dx = x[:, :, None] - x[:, None, :]
    dy = y[:, :, None] - y[:, None, :]
    dz = z[:, :, None] - z[:, None, :]
    r2 = (dx * dx + dy * dy + dz * dz).reshape(S, A * A)
    r2 = jnp.maximum(r2, 1e-2)
    r = jnp.sqrt(r2)

    rstar = jnp.maximum(batch.nb_rstar, 1e-3)
    ratio = 1.07 * rstar / (r + 0.07 * rstar)
    r7 = r2**3 * r
    rs7 = rstar**7
    e_vdw = batch.nb_eps * ratio**7 * (1.12 * rs7 / (r7 + 0.12 * rs7) - 2.0)

    rb = r + 0.05
    denom = batch.diel_constant * (rb if batch.diel_model == 1 else rb * rb)
    e_ele = 332.0716 * batch.nb_qq_scale / denom
    return jnp.sum(e_vdw + e_ele, axis=1)


def mmff_energy(positions: jnp.ndarray, batch: MMFFBatch) -> jnp.ndarray:
    """Per-system MMFF energies [S] (kcal/mol)."""
    total = _nonbonded_dense(positions, batch)
    slots = select_slots(positions, batch.sel_idx, batch.onehot)  # [4, S, 3, T]
    for kind, start, count in batch.offsets:
        p = tuple(slots[q, :, :, start : start + count] for q in range(4))
        e = _BONDED[kind](p, batch.tables[kind])
        total = total + jnp.sum(e, axis=1)
    return total


@partial(jax.jit, static_argnames=())
def mmff_energy_and_grad(positions: jnp.ndarray, batch: MMFFBatch):
    def total(p):
        e = mmff_energy(p, batch)
        return jnp.sum(e), e

    (_, e), g = jax.value_and_grad(total, has_aux=True)(positions)
    g = jnp.where(batch.atom_mask[..., None], g, 0.0)
    return e, g
