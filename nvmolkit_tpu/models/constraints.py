"""Force-field constraint terms (distance / position / angle / torsion).

Counterpart of the reference's ``src/forcefields/forcefield_constraints.h:30-98``
(``DistanceConstraintSpec`` etc. + ``PerMolConstraints``): flat-bottomed
harmonic penalties added on top of any force field's energy. Relative
mode resolves the window against the coordinates current at build time,
matching the reference's behavior.

All windows are flat-bottomed: zero inside [lo, hi], half-harmonic
outside. Angles/torsions are in degrees; torsion violation is circular.
"""
from __future__ import annotations

import dataclasses

import numpy as np

import jax
import jax.numpy as jnp

_DEG = 180.0 / np.pi


@dataclasses.dataclass
class PerSystemConstraints:
    """Host-side accumulating constraint lists for one system."""

    distance: list[tuple[int, int, float, float, float, bool]] = dataclasses.field(
        default_factory=list
    )  # (i, j, lo_or_minus, hi_or_plus, k, relative)
    position: list[tuple[int, float, float]] = dataclasses.field(default_factory=list)
    # (i, max_displacement, k)
    angle: list[tuple[int, int, int, float, float, float, bool]] = dataclasses.field(
        default_factory=list
    )
    torsion: list[tuple[int, int, int, int, float, float, float, bool]] = (
        dataclasses.field(default_factory=list)
    )

    def empty(self) -> bool:
        return not (self.distance or self.position or self.angle or self.torsion)


def _pad(rows, width, dtype=np.float32):
    n = max(1, len(rows))
    out = np.zeros((n, width), dtype)
    for r, row in enumerate(rows):
        out[r] = row
    mask = np.zeros(n, bool)
    mask[: len(rows)] = True
    return out, mask


def build_constraint_batch(
    constraints: list[PerSystemConstraints],
    ref_positions: np.ndarray,  # [S, A, 3] coordinates at build time
) -> dict:
    """Resolve relative windows and pack everything into padded arrays."""
    S, A, _ = ref_positions.shape

    def resolve_distance(s, c):
        i, j, lo, hi, k, relative = c
        if relative:
            d0 = float(np.linalg.norm(ref_positions[s, i] - ref_positions[s, j]))
            lo, hi = d0 - lo, d0 + hi
        return (i, j, lo, hi, k)

    def resolve_angle(s, c):
        i, j, k_at, lo, hi, k, relative = c
        if relative:
            u = ref_positions[s, i] - ref_positions[s, j]
            v = ref_positions[s, k_at] - ref_positions[s, j]
            a0 = float(
                np.degrees(
                    np.arccos(
                        np.clip(
                            np.dot(u, v)
                            / max(np.linalg.norm(u) * np.linalg.norm(v), 1e-9),
                            -1,
                            1,
                        )
                    )
                )
            )
            lo, hi = a0 - lo, a0 + hi
        return (i, j, k_at, lo, hi, k)

    def resolve_torsion(s, c):
        i, j, k_at, l, lo, hi, k, relative = c
        if relative:
            p = ref_positions[s]
            b1, b2, b3 = p[j] - p[i], p[k_at] - p[j], p[l] - p[k_at]
            n1, n2 = np.cross(b1, b2), np.cross(b2, b3)
            m1 = np.cross(n1, b2 / max(np.linalg.norm(b2), 1e-9))
            phi0 = float(np.degrees(np.arctan2(np.dot(m1, n2), np.dot(n1, n2))))
            lo, hi = phi0 - lo, phi0 + hi
        return (i, j, k_at, l, lo, hi, k)

    dist_rows, dist_sys = [], []
    pos_rows, pos_sys = [], []
    ang_rows, ang_sys = [], []
    tor_rows, tor_sys = [], []
    for s, cs in enumerate(constraints):
        for c in cs.distance:
            dist_rows.append(resolve_distance(s, c))
            dist_sys.append(s)
        for (i, maxd, k) in cs.position:
            p0 = ref_positions[s, i]
            pos_rows.append((i, p0[0], p0[1], p0[2], maxd, k))
            pos_sys.append(s)
        for c in cs.angle:
            ang_rows.append(resolve_angle(s, c))
            ang_sys.append(s)
        for c in cs.torsion:
            tor_rows.append(resolve_torsion(s, c))
            tor_sys.append(s)

    def pack(rows, sys, width):
        arr, mask = _pad(rows, width)
        sysa = np.zeros(max(1, len(sys)), np.int32)
        sysa[: len(sys)] = sys
        return jnp.asarray(arr), jnp.asarray(sysa), jnp.asarray(mask)

    d_arr, d_sys, d_mask = pack(dist_rows, dist_sys, 5)
    p_arr, p_sys, p_mask = pack(pos_rows, pos_sys, 6)
    a_arr, a_sys, a_mask = pack(ang_rows, ang_sys, 6)
    t_arr, t_sys, t_mask = pack(tor_rows, tor_sys, 7)
    return {
        "distance": (d_arr, d_sys, d_mask),
        "position": (p_arr, p_sys, p_mask),
        "angle": (a_arr, a_sys, a_mask),
        "torsion": (t_arr, t_sys, t_mask),
        "n_systems": ref_positions.shape[0],
        "max_atoms": A,
    }


def _window_penalty(x, lo, hi, k):
    over = jnp.maximum(x - hi, 0.0)
    under = jnp.maximum(lo - x, 0.0)
    v = over + under
    return 0.5 * k * v * v


def constraint_energy(positions: jnp.ndarray, batch: dict) -> jnp.ndarray:
    """Per-system constraint energies [S]."""
    S = batch["n_systems"]
    A = batch["max_atoms"]
    flat = positions.reshape(S * A, 3)
    total = jnp.zeros(S, dtype=positions.dtype)

    arr, sys, mask = batch["distance"]
    i = arr[:, 0].astype(jnp.int32)
    j = arr[:, 1].astype(jnp.int32)
    diff = flat[sys * A + i] - flat[sys * A + j]
    diff = jnp.where(mask[:, None], diff, jnp.asarray([1.0, 0, 0]))
    d = jnp.sqrt(jnp.sum(diff * diff, axis=-1) + 1e-12)
    e = jnp.where(mask, _window_penalty(d, arr[:, 2], arr[:, 3], arr[:, 4]), 0.0)
    total = total + jax.ops.segment_sum(e, sys, num_segments=S)

    arr, sys, mask = batch["position"]
    i = arr[:, 0].astype(jnp.int32)
    diff = flat[sys * A + i] - arr[:, 1:4]
    diff = jnp.where(mask[:, None], diff, jnp.asarray([1.0, 0, 0]))
    disp = jnp.sqrt(jnp.sum(diff * diff, axis=-1) + 1e-12)
    e = jnp.where(mask, _window_penalty(disp, 0.0, arr[:, 4], arr[:, 5]), 0.0)
    total = total + jax.ops.segment_sum(e, sys, num_segments=S)

    arr, sys, mask = batch["angle"]
    i = arr[:, 0].astype(jnp.int32)
    j = arr[:, 1].astype(jnp.int32)
    k_at = arr[:, 2].astype(jnp.int32)
    u = flat[sys * A + i] - flat[sys * A + j]
    v = flat[sys * A + k_at] - flat[sys * A + j]
    u = jnp.where(mask[:, None], u, jnp.asarray([1.0, 0, 0]))
    v = jnp.where(mask[:, None], v, jnp.asarray([0, 1.0, 0]))
    nu = jnp.sqrt(jnp.sum(u * u, -1) + 1e-12)
    nv = jnp.sqrt(jnp.sum(v * v, -1) + 1e-12)
    ang = jnp.arccos(jnp.clip(jnp.sum(u * v, -1) / (nu * nv), -1, 1)) * _DEG
    e = jnp.where(mask, _window_penalty(ang, arr[:, 3], arr[:, 4], arr[:, 5]), 0.0)
    total = total + jax.ops.segment_sum(e, sys, num_segments=S)

    arr, sys, mask = batch["torsion"]
    ii = arr[:, 0].astype(jnp.int32)
    jj = arr[:, 1].astype(jnp.int32)
    kk = arr[:, 2].astype(jnp.int32)
    ll = arr[:, 3].astype(jnp.int32)
    b1 = flat[sys * A + jj] - flat[sys * A + ii]
    b2 = flat[sys * A + kk] - flat[sys * A + jj]
    b3 = flat[sys * A + ll] - flat[sys * A + kk]
    b1 = jnp.where(mask[:, None], b1, jnp.asarray([1.0, 0, 0]))
    b2 = jnp.where(mask[:, None], b2, jnp.asarray([0, 1.0, 0]))
    b3 = jnp.where(mask[:, None], b3, jnp.asarray([0, 0, 1.0]))
    n1 = jnp.cross(b1, b2)
    n2 = jnp.cross(b2, b3)
    m1 = jnp.cross(n1, b2 / jnp.linalg.norm(b2, axis=-1, keepdims=True).clip(1e-9))
    phi = jnp.degrees(jnp.arctan2(jnp.sum(m1 * n2, -1), jnp.sum(n1 * n2, -1)))
    # circular violation: shift phi into the window's frame
    lo, hi, k = arr[:, 4], arr[:, 5], arr[:, 6]
    center = 0.5 * (lo + hi)
    delta = (phi - center + 180.0) % 360.0 - 180.0
    half = 0.5 * (hi - lo)
    viol = jnp.maximum(jnp.abs(delta) - half, 0.0)
    e = jnp.where(mask, 0.5 * k * viol * viol, 0.0)
    total = total + jax.ops.segment_sum(e, sys, num_segments=S)
    return total
