"""Brute-force scalar oracles for the force-field stack (UFF, DG, ETK).

Companion to test_bruteforce_differential.py (RMSD/TFD/smoothing/MMFF):
each batched device energy is recomputed by an independent f64 scalar
loop written from the published equations / the reference's term forms
(``src/forcefields/uff_kernels.cu``, ``dist_geom_kernels.cu``), over
the SAME term tables, validating the padded/masked batch machinery and
the one-hot-einsum quad selection end to end.
"""
import numpy as np
import pytest

import jax.numpy as jnp

from nvmolkit_tpu.chem import mol_from_smiles


def _random_coords(n, rng, scale=1.5):
    return (scale * rng.normal(size=(n, 3))).astype(np.float32)


# ---------------------------------------------------------------------------
# UFF
# ---------------------------------------------------------------------------

def _scalar_uff_energy(m, terms, p):
    """f64 scalar recompute from the UFFTerms tables + exclusion rule."""
    from nvmolkit_tpu.models.uff.energy import _nb_exclusion
    from nvmolkit_tpu.models.uff.params import uff_atom_type

    e = 0.0
    t = terms.bonds
    for r in range(t.atoms.shape[0]):
        i, j = t.atoms[r]
        dr = np.linalg.norm(p[i] - p[j]) - t.params["r0"][r]
        e += 0.5 * t.params["k"][r] * dr * dr
    t = terms.angles
    for r in range(t.atoms.shape[0]):
        i, j, k = t.atoms[r]
        u, v = p[i] - p[j], p[k] - p[j]
        c = np.clip(u @ v / (np.linalg.norm(u) * np.linalg.norm(v)), -1, 1)
        poly = sum(t.params[f"a{d}"][r] * c**d for d in range(5))
        e += t.params["k"][r] * poly
    t = terms.torsions
    for r in range(t.atoms.shape[0]):
        i, j, k, l = t.atoms[r]
        b1, b2, b3 = p[j] - p[i], p[k] - p[j], p[l] - p[k]
        n1, n2 = np.cross(b1, b2), np.cross(b2, b3)
        c = np.clip(
            n1 @ n2 / (np.linalg.norm(n1) * np.linalg.norm(n2)), -1, 1
        )
        e += sum(t.params[f"b{d}"][r] * c**d for d in range(7))
    t = terms.inversions
    for r in range(t.atoms.shape[0]):
        i, j, k, l = t.atoms[r]
        rji, rjk, rjl = p[i] - p[j], p[k] - p[j], p[l] - p[j]
        n = np.cross(rji, rjk)
        sin_y = np.clip(
            n @ rjl / (np.linalg.norm(n) * np.linalg.norm(rjl)), -1, 1
        )
        cos_w = np.sqrt(max(1.0 - sin_y * sin_y, 1e-10))
        e += t.params["k"][r] * (1.0 - cos_w)
    # vdW: LJ 12-6 over all pairs minus the 1-2/1-3 exclusions, UFF
    # combination x_ij = sqrt(x_i x_j), D_ij = sqrt(D_i D_j); the dense
    # kernel floors r^2 at 1e-2
    ap = [uff_atom_type(m, i) for i in range(m.num_atoms)]
    excl = _nb_exclusion(m)
    for i in range(m.num_atoms):
        for j in range(i + 1, m.num_atoms):
            if (i, j) in excl:
                continue
            r2 = max(float(np.sum((p[i] - p[j]) ** 2)), 1e-2)
            x2 = ap[i].x1 * ap[j].x1
            dij = np.sqrt(ap[i].D1 * ap[j].D1)
            r6 = (x2 / r2) ** 3
            e += dij * (r6 * r6 - 2.0 * r6)
    return e


class TestUFFTotalEnergyBruteForce:
    def test_batched_energy_matches_scalar_recompute(self, rng):
        from nvmolkit_tpu.models.uff.builder import build_uff_terms
        from nvmolkit_tpu.models.uff.energy import make_batched_uff, uff_energy

        mols = [
            mol_from_smiles(s)
            for s in ("CCCCO", "c1ccccc1C", "CC(=O)NC", "C=CC#N")
        ]
        A = 24
        batch = make_batched_uff(mols, max_atoms=A)
        pos = np.zeros((len(mols), A, 3), np.float32)
        for k, m in enumerate(mols):
            pos[k, : m.num_atoms] = _random_coords(m.num_atoms, rng)
        e_dev = np.asarray(uff_energy(jnp.asarray(pos), batch))
        for k, m in enumerate(mols):
            ref = _scalar_uff_energy(
                m, build_uff_terms(m), pos[k].astype(np.float64)
            )
            assert abs(e_dev[k] - ref) < max(2e-2, 2e-4 * abs(ref)), (
                k, e_dev[k], ref
            )


# ---------------------------------------------------------------------------
# DG (4-D distance-geometry force field)
# ---------------------------------------------------------------------------

class TestDGEnergyBruteForce:
    def test_energy_matches_scalar_recompute(self, rng):
        from nvmolkit_tpu.models.dist_geom import dg_energy

        S, A, C = 3, 10, 2
        pos = rng.normal(size=(S, A, 4)).astype(np.float32) * 1.5
        # random (not necessarily consistent) bounds — the energy form
        # is defined for any ub/lb
        ub = (2.0 + 2.0 * rng.random((S, A, A))).astype(np.float32)
        lb = (0.5 + rng.random((S, A, A))).astype(np.float32)
        mask = np.zeros((S, A, A), bool)
        for s in range(S):
            n = A - s  # vary real-atom counts to exercise padding
            mask[s, :n, :n] = np.triu(np.ones((n, n), bool), 1)
        cidx = rng.integers(0, 6, size=(S, C, 4)).astype(np.int32)
        clb = (-1.0 - rng.random((S, C))).astype(np.float32)
        cub = (1.0 + rng.random((S, C))).astype(np.float32)
        cmask = np.asarray([[True, False], [True, True], [False, False]])
        w_chiral, w4 = 0.7, 0.3

        e_dev = np.asarray(
            dg_energy(
                jnp.asarray(pos), jnp.asarray(ub * ub), jnp.asarray(lb * lb),
                jnp.asarray(mask), jnp.asarray(cidx), jnp.asarray(clb),
                jnp.asarray(cub), jnp.asarray(cmask),
                chiral_weight=w_chiral, fourth_dim_weight=w4,
            )
        )

        p = pos.astype(np.float64)
        for s in range(S):
            e = 0.0
            for i in range(A):
                for j in range(A):
                    if not mask[s, i, j]:
                        continue
                    d2 = float(np.sum((p[s, i] - p[s, j]) ** 2))
                    u2, l2 = float(ub[s, i, j]) ** 2, float(lb[s, i, j]) ** 2
                    if d2 > u2:
                        v = d2 / u2 - 1.0
                    elif d2 < l2:
                        v = 2.0 * l2 / (l2 + d2) - 1.0
                    else:
                        v = 0.0
                    e += v * v
            for c in range(C):
                if not cmask[s, c]:
                    continue
                q = p[s, cidx[s, c], :3]
                vol = float(
                    (q[0] - q[3]) @ np.cross(q[1] - q[3], q[2] - q[3])
                )
                viol = max(clb[s, c] - vol, 0.0) + max(vol - cub[s, c], 0.0)
                e += w_chiral * viol * viol
            e += w4 * float(np.sum(p[s, :, 3] ** 2))
            assert abs(e_dev[s] - e) < max(1e-2, 1e-4 * abs(e)), (s, e_dev[s], e)


# ---------------------------------------------------------------------------
# ETK (experimental-torsion + basic-knowledge 3-D refinement)
# ---------------------------------------------------------------------------

class TestETKEnergyBruteForce:
    def test_energy_matches_scalar_recompute(self, rng):
        from nvmolkit_tpu.models.etk import (
            build_etk_terms, etk_energy, pad_etk_batch,
        )
        from nvmolkit_tpu.models.etkdg_torsions import default_torsion_provider

        provider = default_torsion_provider()
        mols = [
            mol_from_smiles(s)
            for s in ("c1ccccc1CC", "CC(=O)NCC", "C=CCOC")
        ]
        A = 24
        host = [build_etk_terms(m, provider) for m in mols]
        assert any(t.torsion_idx.shape[0] > 0 for t in host)
        assert any(t.improper_idx.shape[0] > 0 for t in host)
        etk = {k: jnp.asarray(v) for k, v in pad_etk_batch(host).items()}

        pos = np.zeros((len(mols), A, 3), np.float32)
        for k, m in enumerate(mols):
            pos[k, : m.num_atoms] = _random_coords(m.num_atoms, rng)
        # inert bounds (huge ub, zero lb) so the bounds part is exactly 0
        # and the improper+torsion machinery is isolated; the bounds form
        # itself is covered by TestDGEnergyBruteForce
        ub2 = np.full((len(mols), A, A), 1e6, np.float32)
        lb2 = np.zeros((len(mols), A, A), np.float32)
        pmask = np.zeros((len(mols), A, A), bool)

        e_dev = np.asarray(
            etk_energy(
                jnp.asarray(pos), jnp.asarray(ub2), jnp.asarray(lb2),
                jnp.asarray(pmask), etk, bounds_weight=1.0,
            )
        )

        for s, t in enumerate(host):
            p = pos[s].astype(np.float64)
            e = 0.0
            for r in range(t.improper_idx.shape[0]):
                i, j, k, l = t.improper_idx[r]
                n = np.cross(p[i] - p[j], p[k] - p[j])
                rjl = p[l] - p[j]
                sin_y = np.clip(
                    n @ rjl / (np.linalg.norm(n) * np.linalg.norm(rjl)),
                    -1, 1,
                )
                cos_w = np.sqrt(max(1.0 - sin_y * sin_y, 1e-10))
                e += float(t.improper_k[r]) * (1.0 - cos_w)
            for r in range(t.torsion_idx.shape[0]):
                i, j, k, l = t.torsion_idx[r]
                b1, b2, b3 = p[j] - p[i], p[k] - p[j], p[l] - p[k]
                n1, n2 = np.cross(b1, b2), np.cross(b2, b3)
                m1 = np.cross(n1, b2 / np.linalg.norm(b2))
                phi = np.arctan2(m1 @ n2, n1 @ n2)
                for d in range(6):
                    e += float(t.torsion_coeffs[r, d]) * (
                        1.0 + np.cos((d + 1) * phi - float(t.torsion_phase[r, d]))
                    )
            assert abs(e_dev[s] - e) < max(2e-2, 2e-4 * abs(e)), (s, e_dev[s], e)

    def test_torsion_gradient_matches_finite_difference(self, rng):
        """The analytic (autodiff) ETK gradient vs central differences —
        catches sign/phase errors the energy-only oracle cannot."""
        from nvmolkit_tpu.models.etk import (
            build_etk_terms, etk_energy_and_grad, pad_etk_batch,
        )
        from nvmolkit_tpu.models.etkdg_torsions import default_torsion_provider

        m = mol_from_smiles("CCCC")
        host = [build_etk_terms(m, default_torsion_provider())]
        assert host[0].torsion_idx.shape[0] > 0
        etk = {k: jnp.asarray(v) for k, v in pad_etk_batch(host).items()}
        A = m.num_atoms
        pos = _random_coords(A, rng)[None]
        ub2 = np.full((1, A, A), 1e6, np.float32)
        lb2 = np.zeros((1, A, A), np.float32)
        pmask = np.zeros((1, A, A), bool)
        amask = np.ones((1, A), bool)

        def e_of(p):
            e, _ = etk_energy_and_grad(
                jnp.asarray(p, jnp.float32), jnp.asarray(ub2),
                jnp.asarray(lb2), jnp.asarray(pmask), etk,
                jnp.asarray(amask), bounds_weight=1.0,
            )
            return float(np.asarray(e)[0])

        _, g = etk_energy_and_grad(
            jnp.asarray(pos), jnp.asarray(ub2), jnp.asarray(lb2),
            jnp.asarray(pmask), etk, jnp.asarray(amask), bounds_weight=1.0,
        )
        g = np.asarray(g)[0]
        h = 1e-3
        for a in range(A):
            for d in range(3):
                pp, pm_ = pos.copy(), pos.copy()
                pp[0, a, d] += h
                pm_[0, a, d] -= h
                fd = (e_of(pp) - e_of(pm_)) / (2 * h)
                assert abs(g[a, d] - fd) < max(5e-2, 5e-2 * abs(fd)), (
                    a, d, g[a, d], fd
                )


# ---------------------------------------------------------------------------
# Coordinate generation (metric-matrix projection)
# ---------------------------------------------------------------------------

class TestCoordGenProjection:
    def test_exact_bounds_recover_geometry(self, rng):
        """Classical-MDS exactness: with upper == lower == the true
        distance matrix of a 3-D point set, the double-centering + eigh
        projection must reproduce every pairwise distance (up to rigid
        motion), including under row padding."""
        import jax
        from nvmolkit_tpu.models.dist_geom import random_distance_matrices

        S, A = 2, 12
        n_real = [12, 9]
        d_true = np.zeros((S, A, A), np.float32)
        mask = np.zeros((S, A), bool)
        pts_all = []
        for s in range(S):
            n = n_real[s]
            pts = rng.normal(size=(n, 3)) * 2.0
            pts_all.append(pts)
            d = np.sqrt(((pts[:, None] - pts[None]) ** 2).sum(-1))
            d_true[s, :n, :n] = d
            mask[s, :n] = True

        coords = np.asarray(
            random_distance_matrices(
                jax.random.PRNGKey(0), jnp.asarray(d_true),
                jnp.asarray(d_true), jnp.asarray(mask), n_dims=3,
            )
        )
        for s in range(S):
            n = n_real[s]
            c = coords[s, :n].astype(np.float64)
            d_got = np.sqrt(((c[:, None] - c[None]) ** 2).sum(-1))
            np.testing.assert_allclose(
                d_got, d_true[s, :n, :n], atol=5e-3, rtol=5e-3
            )
            # padding rows stay zeroed
            assert np.all(coords[s, n:] == 0.0)
