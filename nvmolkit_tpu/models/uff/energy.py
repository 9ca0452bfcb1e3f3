"""Batched UFF energy as a pure JAX function.

The reference evaluates per-term CUDA kernels accumulating into an
energy scratch buffer (``src/forcefields/uff_kernels.cu``); here every
term kind is one masked vectorized expression and per-system energies
are a ``segment_sum``. Gradients come from ``jax.grad`` — no analytic
gradient kernels (the TPU-native replacement for
``uff_kernels_device.cuh``).

Masked-term safety: padded terms reference atom 0 of system 0, which
would produce r=0 singularities; every distance/angle computation swaps
in safe inputs under the mask before any division.
"""
from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from nvmolkit_tpu.chem.mol import Mol
from nvmolkit_tpu.models.terms import BatchedTerms, concat_term_tables
from nvmolkit_tpu.models.uff.builder import UFFTerms, build_uff_terms

_EPS = 1e-10


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class UFFBatch:
    """Device-side batched UFF system (pytree of jnp arrays)."""

    n_systems: int
    max_atoms: int
    atom_mask: jnp.ndarray  # [S, A] bool
    tables: dict[str, dict[str, jnp.ndarray]]  # kind -> arrays

    def tree_flatten(self):
        return (self.atom_mask, self.tables), (self.n_systems, self.max_atoms)

    @classmethod
    def tree_unflatten(cls, aux, children):
        atom_mask, tables = children
        return cls(aux[0], aux[1], atom_mask, tables)


def _batched_to_dict(bt: BatchedTerms) -> dict[str, jnp.ndarray]:
    out = {
        "atoms": jnp.asarray(bt.atoms),
        "system": jnp.asarray(bt.system),
        "mask": jnp.asarray(bt.mask),
    }
    for k, v in bt.params.items():
        out[k] = jnp.asarray(v)
    return out


def make_batched_uff(
    mols: list[Mol], max_atoms: int, vdw_threshold: float = 100.0
) -> UFFBatch:
    """Build and batch UFF terms for a bucket of molecules."""
    terms = [build_uff_terms(m, vdw_threshold) for m in mols]
    return batch_uff_terms(terms, [m.num_atoms for m in mols], max_atoms)


def batch_uff_terms(
    terms: list[UFFTerms], n_atoms: list[int], max_atoms: int
) -> UFFBatch:
    S = len(terms)
    atom_mask = np.zeros((S, max_atoms), dtype=bool)
    for s, na in enumerate(n_atoms):
        if na > max_atoms:
            raise ValueError(f"system {s} has {na} atoms > bucket {max_atoms}")
        atom_mask[s, :na] = True
    tables = {
        "bonds": concat_term_tables([t.bonds for t in terms]),
        "angles": concat_term_tables([t.angles for t in terms]),
        "torsions": concat_term_tables([t.torsions for t in terms]),
        "inversions": concat_term_tables([t.inversions for t in terms]),
        "vdw": concat_term_tables([t.vdw for t in terms]),
    }
    return UFFBatch(
        n_systems=S,
        max_atoms=max_atoms,
        atom_mask=jnp.asarray(atom_mask),
        tables={k: _batched_to_dict(v) for k, v in tables.items()},
    )


def _gather(positions: jnp.ndarray, table: dict, slot: int) -> jnp.ndarray:
    S, A, _ = positions.shape
    flat = positions.reshape(S * A, 3)
    idx = table["system"] * A + table["atoms"][:, slot]
    return flat[idx]


def _safe_norm(d: jnp.ndarray) -> jnp.ndarray:
    return jnp.sqrt(jnp.sum(d * d, axis=-1) + _EPS)


_EX = np.asarray([1.0, 0.0, 0.0], dtype=np.float32)
_EY = np.asarray([0.0, 1.0, 0.0], dtype=np.float32)
_EZ = np.asarray([0.0, 0.0, 1.0], dtype=np.float32)


def _safe_vec(d: jnp.ndarray, mask: jnp.ndarray, unit) -> jnp.ndarray:
    """Swap masked-out lanes' geometry for a benign unit vector.

    Masking only the energy output is not enough: autodiff produces
    0 * inf = NaN cotangents through singular masked lanes (padded terms
    reference coincident atoms). The swap must happen on the inputs.
    """
    return jnp.where(mask[:, None], d, unit.astype(d.dtype))


def _bond_energy(positions, t) -> jnp.ndarray:
    pi = _gather(positions, t, 0)
    pj = _gather(positions, t, 1)
    d = _safe_vec(pi - pj, t["mask"], _EX)
    r = _safe_norm(d)
    dr = r - t["r0"]
    return jnp.where(t["mask"], 0.5 * t["k"] * dr * dr, 0.0)


def _cos_angle(positions, t) -> jnp.ndarray:
    pi = _gather(positions, t, 0)
    pj = _gather(positions, t, 1)
    pk = _gather(positions, t, 2)
    u = _safe_vec(pi - pj, t["mask"], _EX)
    v = _safe_vec(pk - pj, t["mask"], _EY)
    cos = jnp.sum(u * v, axis=-1) / (_safe_norm(u) * _safe_norm(v))
    return jnp.clip(cos, -1.0, 1.0)


def _angle_energy(positions, t) -> jnp.ndarray:
    c = _cos_angle(positions, t)
    poly = t["a0"] + c * (t["a1"] + c * (t["a2"] + c * (t["a3"] + c * t["a4"])))
    return jnp.where(t["mask"], t["k"] * poly, 0.0)


def _cos_dihedral(positions, t) -> jnp.ndarray:
    pi = _gather(positions, t, 0)
    pj = _gather(positions, t, 1)
    pk = _gather(positions, t, 2)
    pl = _gather(positions, t, 3)
    b1 = _safe_vec(pj - pi, t["mask"], _EX)
    b2 = _safe_vec(pk - pj, t["mask"], _EY)
    b3 = _safe_vec(pl - pk, t["mask"], _EZ)
    n1 = jnp.cross(b1, b2)
    n2 = jnp.cross(b2, b3)
    cos = jnp.sum(n1 * n2, axis=-1) / (_safe_norm(n1) * _safe_norm(n2))
    return jnp.clip(cos, -1.0, 1.0)


def _torsion_energy(positions, t) -> jnp.ndarray:
    c = _cos_dihedral(positions, t)
    poly = t["b0"] + c * (
        t["b1"]
        + c * (t["b2"] + c * (t["b3"] + c * (t["b4"] + c * (t["b5"] + c * t["b6"]))))
    )
    return jnp.where(t["mask"], poly, 0.0)


def _inversion_energy(positions, t) -> jnp.ndarray:
    # Wilson angle w of bond j-l out of plane (j,i,k): E = K (1 - cos w)
    pi = _gather(positions, t, 0)
    pj = _gather(positions, t, 1)
    pk = _gather(positions, t, 2)
    pl = _gather(positions, t, 3)
    rji = _safe_vec(pi - pj, t["mask"], _EX)
    rjk = _safe_vec(pk - pj, t["mask"], _EY)
    rjl = _safe_vec(pl - pj, t["mask"], _EX)
    n = jnp.cross(rji, rjk)
    sin_y = jnp.sum(n * rjl, axis=-1) / (_safe_norm(n) * _safe_norm(rjl))
    sin_y = jnp.clip(sin_y, -1.0, 1.0)
    cos_w = jnp.sqrt(jnp.clip(1.0 - sin_y * sin_y, _EPS, 1.0))
    return jnp.where(t["mask"], t["k"] * (1.0 - cos_w), 0.0)


def _vdw_energy(positions, t) -> jnp.ndarray:
    pi = _gather(positions, t, 0)
    pj = _gather(positions, t, 1)
    d = _safe_vec(pi - pj, t["mask"], _EX * 10.0)
    r = _safe_norm(d)
    ratio = t["x"] / r
    r6 = ratio**6
    return jnp.where(t["mask"], t["d"] * (r6 * r6 - 2.0 * r6), 0.0)


_TERM_ENERGY = {
    "bonds": _bond_energy,
    "angles": _angle_energy,
    "torsions": _torsion_energy,
    "inversions": _inversion_energy,
    "vdw": _vdw_energy,
}


def uff_energy(positions: jnp.ndarray, batch: UFFBatch) -> jnp.ndarray:
    """Per-system UFF energies: positions [S, A, 3] -> [S] (kcal/mol)."""
    S = positions.shape[0]
    total = jnp.zeros(S, dtype=positions.dtype)
    for kind, fn in _TERM_ENERGY.items():
        t = batch.tables[kind]
        e = fn(positions, t)
        total = total + jax.ops.segment_sum(e, t["system"], num_segments=S)
    return total


@partial(jax.jit, static_argnames=())
def uff_energy_and_grad(positions: jnp.ndarray, batch: UFFBatch):
    """([S] energies, [S, A, 3] gradients) with masked atoms zeroed."""
    def total(p):
        e = uff_energy(p, batch)
        return jnp.sum(e), e

    (_, e), g = jax.value_and_grad(total, has_aux=True)(positions)
    g = jnp.where(batch.atom_mask[..., None], g, 0.0)
    return e, g
