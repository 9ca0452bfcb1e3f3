"""MMFF94 batched energy — exact published functional forms.

Replaces the reference's per-term CUDA kernels
(``src/forcefields/mmff_kernels_device.cuh``); gradients via autodiff.
All energies kcal/mol, distances Angstrom, angles degrees where MMFF
defines them so (angle bend, out-of-plane).

  bond stretch   E = 143.9325/2 kb dr^2 (1 + cs dr + 7/12 cs^2 dr^2),
                 cs = -2 A^-1
  angle bend     E = 0.043844/2 ka dt^2 (1 + cb dt), cb = -0.007 deg^-1
                 linear: E = 143.9325 ka (1 + cos theta)
  stretch-bend   E = 2.51210 (kba_ijk dr_ij + kba_kji dr_kj) dt
  out-of-plane   E = 0.043844/2 koop chi^2 (Wilson angle, degrees)
  torsion        E = 0.5 (V1(1+cos p) + V2(1-cos 2p) + V3(1+cos 3p))
  vdW (buf 14-7) E = eps (1.07 R*/(R+0.07R*))^7 (1.12 R*^7/(R^7+0.12R*^7) - 2)
  electrostatic  E = 332.0716 qq / (D (R + 0.05)^n), 0.75 scale on 1-4
"""
from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from nvmolkit_tpu.chem.mol import Mol
from nvmolkit_tpu.models.mmff.terms import MMFFProperties, MMFFTerms
from nvmolkit_tpu.models.terms import concat_term_tables

_EPS = 1e-10
_DEG = 180.0 / np.pi
_CS = -2.0
_CB = -0.006981317  # -0.007 deg^-1 as used by MMFF94 (radian-free form)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class MMFFBatch:
    n_systems: int
    max_atoms: int
    diel_constant: float
    diel_model: int
    atom_mask: jnp.ndarray
    tables: dict[str, dict[str, jnp.ndarray]]

    def tree_flatten(self):
        return (self.atom_mask, self.tables), (
            self.n_systems,
            self.max_atoms,
            self.diel_constant,
            self.diel_model,
        )

    @classmethod
    def tree_unflatten(cls, aux, children):
        atom_mask, tables = children
        return cls(aux[0], aux[1], aux[2], aux[3], atom_mask, tables)


def _to_dict(bt):
    out = {
        "atoms": jnp.asarray(bt.atoms),
        "system": jnp.asarray(bt.system),
        "mask": jnp.asarray(bt.mask),
    }
    for k, v in bt.params.items():
        out[k] = jnp.asarray(v)
    return out


def batch_mmff_terms(
    terms: list[MMFFTerms],
    n_atoms: list[int],
    max_atoms: int,
    properties: MMFFProperties | None = None,
) -> MMFFBatch:
    props = properties or MMFFProperties()
    S = len(terms)
    atom_mask = np.zeros((S, max_atoms), bool)
    for s, na in enumerate(n_atoms):
        if na > max_atoms:
            raise ValueError(f"system {s}: {na} atoms > bucket {max_atoms}")
        atom_mask[s, :na] = True
    kinds = ["bonds", "angles", "stretch_bends", "oop", "torsions", "vdw", "ele"]
    enabled = {
        "bonds": props.bondTerm,
        "angles": props.angleTerm,
        "stretch_bends": props.stretchBendTerm,
        "oop": props.oopTerm,
        "torsions": props.torsionTerm,
        "vdw": props.vdWTerm,
        "ele": props.eleTerm,
    }
    tables = {}
    for kind in kinds:
        if not enabled[kind]:
            continue
        tables[kind] = _to_dict(concat_term_tables([getattr(t, kind) for t in terms]))
    return MMFFBatch(
        n_systems=S,
        max_atoms=max_atoms,
        diel_constant=props.dielConstant,
        diel_model=props.dielModel,
        atom_mask=jnp.asarray(atom_mask),
        tables=tables,
    )


def make_batched_mmff(
    mols: list[Mol],
    max_atoms: int,
    properties: MMFFProperties | None = None,
    provider=None,
) -> MMFFBatch:
    from nvmolkit_tpu.models.mmff.providers import default_provider

    provider = provider or default_provider()
    props = properties or MMFFProperties()
    terms = [provider.build_terms(m, props) for m in mols]
    return batch_mmff_terms(terms, [m.num_atoms for m in mols], max_atoms, props)


# --- geometry helpers (shared style with models/uff/energy.py) -------------

_EX = np.asarray([1.0, 0.0, 0.0], np.float32)
_EY = np.asarray([0.0, 1.0, 0.0], np.float32)
_EZ = np.asarray([0.0, 0.0, 1.0], np.float32)


def _gather(positions, t, slot):
    S, A, _ = positions.shape
    flat = positions.reshape(S * A, 3)
    return flat[t["system"] * A + t["atoms"][:, slot]]


def _safe(d, mask, unit):
    return jnp.where(mask[:, None], d, unit.astype(d.dtype))


def _norm(d):
    return jnp.sqrt(jnp.sum(d * d, axis=-1) + _EPS)


def _bond(positions, t):
    d = _safe(_gather(positions, t, 0) - _gather(positions, t, 1), t["mask"], _EX)
    dr = _norm(d) - t["r0"]
    e = (
        0.5 * 143.9325 * t["kb"] * dr * dr
        * (1.0 + _CS * dr + (7.0 / 12.0) * _CS * _CS * dr * dr)
    )
    return jnp.where(t["mask"], e, 0.0)


def _angle_deg(positions, t):
    u = _safe(_gather(positions, t, 0) - _gather(positions, t, 1), t["mask"], _EX)
    v = _safe(_gather(positions, t, 2) - _gather(positions, t, 1), t["mask"], _EY)
    cos = jnp.clip(jnp.sum(u * v, axis=-1) / (_norm(u) * _norm(v)), -1.0, 1.0)
    return jnp.arccos(cos) * _DEG, cos


def _angle(positions, t):
    theta, cos = _angle_deg(positions, t)
    dt = theta - t["theta0"]
    bent = 0.5 * 0.043844 * t["ka"] * dt * dt * (1.0 + _CB * dt)
    linear = 143.9325 * t["ka"] * (1.0 + cos)
    e = jnp.where(t["is_linear"] > 0.5, linear, bent)
    return jnp.where(t["mask"], e, 0.0)


def _stretch_bend(positions, t):
    pi = _gather(positions, t, 0)
    pj = _gather(positions, t, 1)
    pk = _gather(positions, t, 2)
    u = _safe(pi - pj, t["mask"], _EX)
    v = _safe(pk - pj, t["mask"], _EY)
    rij = _norm(u)
    rkj = _norm(v)
    cos = jnp.clip(jnp.sum(u * v, axis=-1) / (rij * rkj), -1.0, 1.0)
    dt = jnp.arccos(cos) * _DEG - t["theta0"]
    e = 2.51210 * (
        t["kba_ijk"] * (rij - t["r0_ij"]) + t["kba_kji"] * (rkj - t["r0_kj"])
    ) * dt
    return jnp.where(t["mask"], e, 0.0)


def _oop(positions, t):
    # Wilson angle chi of bond j-l vs plane (i, j, k); j is the center
    pi = _gather(positions, t, 0)
    pj = _gather(positions, t, 1)
    pk = _gather(positions, t, 2)
    pl = _gather(positions, t, 3)
    rji = _safe(pi - pj, t["mask"], _EX)
    rjk = _safe(pk - pj, t["mask"], _EY)
    rjl = _safe(pl - pj, t["mask"], _EZ)
    n = jnp.cross(rji, rjk)
    sin_chi = jnp.clip(
        jnp.sum(n * rjl, axis=-1) / (_norm(n) * _norm(rjl)), -1.0, 1.0
    )
    chi = jnp.arcsin(sin_chi) * _DEG
    e = 0.5 * 0.043844 * t["koop"] * chi * chi
    return jnp.where(t["mask"], e, 0.0)


def _torsion(positions, t):
    pi = _gather(positions, t, 0)
    pj = _gather(positions, t, 1)
    pk = _gather(positions, t, 2)
    pl = _gather(positions, t, 3)
    b1 = _safe(pj - pi, t["mask"], _EX)
    b2 = _safe(pk - pj, t["mask"], _EY)
    b3 = _safe(pl - pk, t["mask"], _EZ)
    n1 = jnp.cross(b1, b2)
    n2 = jnp.cross(b2, b3)
    c = jnp.clip(jnp.sum(n1 * n2, axis=-1) / (_norm(n1) * _norm(n2)), -1.0, 1.0)
    cos2 = 2.0 * c * c - 1.0
    cos3 = c * (2.0 * cos2 - 1.0)
    e = 0.5 * (
        t["v1"] * (1.0 + c) + t["v2"] * (1.0 - cos2) + t["v3"] * (1.0 + cos3)
    )
    return jnp.where(t["mask"], e, 0.0)


def _vdw(positions, t):
    d = _safe(
        _gather(positions, t, 0) - _gather(positions, t, 1), t["mask"], _EX * 10.0
    )
    r = _norm(d)
    rstar = t["rstar"]
    ratio = 1.07 * rstar / (r + 0.07 * rstar)
    r7 = r**7
    rs7 = rstar**7
    e = t["eps"] * ratio**7 * (1.12 * rs7 / (r7 + 0.12 * rs7) - 2.0)
    return jnp.where(t["mask"], e, 0.0)


def _make_ele(diel_constant, diel_model):
    def _ele(positions, t):
        d = _safe(
            _gather(positions, t, 0) - _gather(positions, t, 1), t["mask"], _EX * 10.0
        )
        r = _norm(d) + 0.05
        denom = diel_constant * (r if diel_model == 1 else r * r)
        scale = jnp.where(t["is_1_4"] > 0.5, 0.75, 1.0)
        e = 332.0716 * t["qq"] * scale / denom
        return jnp.where(t["mask"], e, 0.0)

    return _ele


def mmff_energy(positions: jnp.ndarray, batch: MMFFBatch) -> jnp.ndarray:
    """Per-system MMFF energies [S] (kcal/mol)."""
    fns = {
        "bonds": _bond,
        "angles": _angle,
        "stretch_bends": _stretch_bend,
        "oop": _oop,
        "torsions": _torsion,
        "vdw": _vdw,
        "ele": _make_ele(batch.diel_constant, batch.diel_model),
    }
    S = positions.shape[0]
    total = jnp.zeros(S, dtype=positions.dtype)
    for kind, t in batch.tables.items():
        e = fns[kind](positions, t)
        total = total + jax.ops.segment_sum(e, t["system"], num_segments=S)
    return total


@partial(jax.jit, static_argnames=())
def mmff_energy_and_grad(positions: jnp.ndarray, batch: MMFFBatch):
    def total(p):
        e = mmff_energy(p, batch)
        return jnp.sum(e), e

    (_, e), g = jax.value_and_grad(total, has_aux=True)(positions)
    g = jnp.where(batch.atom_mask[..., None], g, 0.0)
    return e, g
