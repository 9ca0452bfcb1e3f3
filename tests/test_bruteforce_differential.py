"""Brute-force numpy oracles vs the batched device kernels.

The reference cross-checks its batched GPU kernels against RDKit's
scalar implementations (SURVEY §4.1). RDKit is absent here, so these
oracles are written from the mathematical definitions directly — an
independent scalar implementation per pair, no shared code with the
kernels under test.
"""
import numpy as np
import pytest

from nvmolkit_tpu.chem import mol_from_smiles


@pytest.fixture(scope="module")
def embedded_mols():
    from nvmolkit_tpu.embedMolecules import EmbedMolecules, EmbedParameters

    mols = [
        mol_from_smiles(s)
        for s in ("CCCCCO", "CC(C)CC(=O)O", "c1ccccc1CCN", "CCOC(=O)CC")
    ]
    EmbedMolecules(
        mols, EmbedParameters(randomSeed=5), confsPerMolecule=4,
        maxIterations=10,
    )
    return [m for m in mols if len(m.conformers) >= 3]


def brute_kabsch_rmsd(p: np.ndarray, q: np.ndarray) -> float:
    """Minimum RMSD of q onto p over rotations+translations (f64)."""
    p = p.astype(np.float64) - p.mean(0)
    q = q.astype(np.float64) - q.mean(0)
    h = q.T @ p
    u, s, vt = np.linalg.svd(h)
    d = np.sign(np.linalg.det(u @ vt))
    rot = u @ np.diag([1.0, 1.0, d]) @ vt
    return float(np.sqrt(np.mean(np.sum((q @ rot - p) ** 2, axis=1))))


class TestRmsdBruteForce:
    def test_matrix_matches_pairwise_kabsch(self, embedded_mols):
        from nvmolkit_tpu.conformerRmsd import GetConformerRMSMatrix

        for m in embedded_mols:
            got = GetConformerRMSMatrix(m).numpy()
            n = len(m.conformers)
            k = 0
            for i in range(1, n):
                for j in range(i):
                    want = brute_kabsch_rmsd(
                        m.conformers[i][: m.num_atoms],
                        m.conformers[j][: m.num_atoms],
                    )
                    assert got[k] == pytest.approx(want, abs=2e-3), (i, j)
                    k += 1
            assert k == len(got)


def brute_dihedral(p0, p1, p2, p3) -> float:
    """Dihedral in degrees, [0, 360), in the reference TFD convention
    (``tfd_detail.h computeDihedralAngle``: plane normals from
    (p1-p2, p3-p2); TFD only consumes |delta| on the circle, where the
    convention choice cancels). Scalar f64 — independent of the kernel.
    """
    p0, p1, p2, p3 = (np.asarray(p, np.float64) for p in (p0, p1, p2, p3))
    b1 = p2 - p1
    n1 = np.cross(p0 - p1, b1)
    n2 = np.cross(b1, p3 - p2)
    y = np.cross(n1, n2) @ b1 / np.linalg.norm(b1)
    deg = float(np.degrees(np.arctan2(y, n1 @ n2)))
    return deg + 360.0 if deg < 0 else deg


class TestDihedralBruteForce:
    def test_batched_dihedrals_match_scalar(self, embedded_mols):
        from nvmolkit_tpu.ops.tfd import dihedral_angles
        import jax.numpy as jnp

        rng = np.random.default_rng(0)
        m = embedded_mols[0]
        conf = m.conformers[0][: m.num_atoms].astype(np.float32)
        quads = rng.integers(0, m.num_atoms, size=(16, 4))
        # reject degenerate quads (repeated atoms give undefined planes)
        quads = np.asarray([q for q in quads if len(set(q.tolist())) == 4])
        got = np.asarray(
            dihedral_angles(
                jnp.asarray(conf[None]), jnp.asarray(quads[None, :])
            )
        )[0, 0]  # [C=1, T=1, Q] -> [Q]
        for qi, q in enumerate(quads):
            want = brute_dihedral(*(conf[a] for a in q))
            diff = abs((float(got[qi]) - want + 180.0) % 360.0 - 180.0)
            assert diff < 0.2, (q, got[qi], want)


class TestTriangleSmoothBruteForce:
    def test_matches_scalar_floyd_warshall(self, rng):
        """Device batched smoothing vs a scalar Floyd-Warshall oracle on
        random consistent bounds (distance-geometry smoothing:
        u_ij <- min(u_ij, u_ik + u_kj); l_ij <- max(l_ij, l_ik - u_kj,
        l_kj - u_ik))."""
        import jax.numpy as jnp

        from nvmolkit_tpu.ops.triangle_smooth import triangle_smooth_bounds

        n = 9
        # random points -> consistent metric bounds with slack
        pts = rng.normal(size=(n, 3))
        d = np.sqrt(((pts[:, None] - pts[None]) ** 2).sum(-1))
        ub = d * (1.0 + 0.5 * rng.random((n, n)))
        lb = d * (1.0 - 0.5 * rng.random((n, n)))
        ub = np.maximum(ub, ub.T).astype(np.float32)
        lb = np.minimum(lb, lb.T).astype(np.float32)
        np.fill_diagonal(ub, 0.0)
        np.fill_diagonal(lb, 0.0)

        u = ub.astype(np.float64).copy()
        low = lb.astype(np.float64).copy()
        for k in range(n):
            for i in range(n):
                for j in range(n):
                    if i == j:
                        continue
                    if u[i, j] > u[i, k] + u[k, j]:
                        u[i, j] = u[i, k] + u[k, j]
                    if low[i, j] < low[i, k] - u[k, j]:
                        low[i, j] = low[i, k] - u[k, j]
                    if low[i, j] < low[j, k] - u[k, i]:
                        low[i, j] = low[j, k] - u[k, i]

        mask = np.ones((1, n), bool)
        ub_d, lb_d, ok = triangle_smooth_bounds(
            jnp.asarray(ub[None]), jnp.asarray(lb[None]), jnp.asarray(mask)
        )
        assert bool(np.asarray(ok)[0])
        np.testing.assert_allclose(np.asarray(ub_d)[0], u, atol=2e-4)
        np.testing.assert_allclose(np.asarray(lb_d)[0], low, atol=2e-4)


class TestTFDMatrixBruteForce:
    def test_full_matrix_matches_scalar_recompute(self, embedded_mols):
        """End-to-end TFD matrix vs a scalar f64 recompute of the
        dihedral + per-type combination (Single / Ring-avg / Symmetric-
        min) + weighting math over the same TorsionSet. Enumeration
        parity is covered separately (test_conformer_tools); this pins
        the batched device kernel's math."""
        from nvmolkit_tpu.ops.tfd import (
            TORSION_RING,
            TORSION_SYMMETRIC,
            enumerate_torsions,
        )
        from nvmolkit_tpu.tfd import GetTFDMatrix

        checked = 0
        for m in embedded_mols:
            ts = enumerate_torsions(m)
            if ts.n_torsions == 0:
                continue
            got = GetTFDMatrix(m).numpy()
            confs = [
                np.asarray(c[: m.num_atoms], np.float64) for c in m.conformers
            ]

            def torsion_devs(ca, cb):
                devs = []
                for t in range(ts.n_torsions):
                    qs = ts.quartets[
                        ts.quartet_starts[t]: ts.quartet_starts[t + 1]
                    ]
                    aa = [brute_dihedral(*(ca[x] for x in q)) for q in qs]
                    bb = [brute_dihedral(*(cb[x] for x in q)) for q in qs]

                    def circ(x, y):
                        d = abs(x - y)
                        return min(d, 360.0 - d)

                    if ts.types[t] == TORSION_RING:
                        dev = abs(
                            np.mean([abs(x - 180.0) for x in aa])
                            - np.mean([abs(x - 180.0) for x in bb])
                        )
                    elif ts.types[t] == TORSION_SYMMETRIC:
                        dev = min(circ(x, y) for x in aa for y in bb)
                    else:
                        dev = circ(aa[0], bb[0])
                    devs.append(dev / max(float(ts.max_dev[t]), 1e-6))
                return np.asarray(devs)

            k = 0
            for i in range(1, len(confs)):
                for j in range(i):
                    devs = torsion_devs(confs[i], confs[j])
                    w = ts.weights.astype(np.float64)
                    want = float((devs * w).sum() / w.sum())
                    assert got[k] == pytest.approx(want, abs=2e-3), (i, j)
                    k += 1
                    checked += 1
            assert k == len(got)
        assert checked > 0


class TestMMFFTotalEnergyBruteForce:
    def test_batched_energy_matches_scalar_recompute(self, embedded_mols):
        """Full batched MMFF energy vs a from-the-definitions scalar
        recompute over the SAME term tables (validates the padded/
        masked batch machinery end to end, not just each term form)."""
        import jax.numpy as jnp

        from nvmolkit_tpu.models.mmff import (
            MMFFProperties,
            make_batched_mmff,
            mmff_energy_and_grad,
        )
        from nvmolkit_tpu.models.mmff.providers import default_provider

        props = MMFFProperties()
        prov = default_provider()
        mols = embedded_mols[:3]
        A = 32
        batch = make_batched_mmff(mols, A, props)
        pos = np.zeros((len(mols), A, 3), np.float32)
        for k, m in enumerate(mols):
            pos[k, : m.num_atoms] = m.conformers[0]
        e_dev, _ = mmff_energy_and_grad(jnp.asarray(pos), batch)
        e_dev = np.asarray(e_dev)

        def scalar_energy(m, p):
            t = prov.build_terms(m, props)
            e = 0.0
            cs, cb, deg = -2.0, -0.006981317, 180.0 / np.pi
            for r in range(t.bonds.n_terms):
                i, j = t.bonds.atoms[r]
                dr = np.linalg.norm(p[i] - p[j]) - t.bonds.params["r0"][r]
                kb = t.bonds.params["kb"][r]
                e += 0.5 * 143.9325 * kb * dr * dr * (
                    1.0 + cs * dr + (7.0 / 12.0) * cs * cs * dr * dr
                )
            for r in range(t.angles.n_terms):
                i, j, k = t.angles.atoms[r]
                u, v = p[i] - p[j], p[k] - p[j]
                cosv = np.clip(
                    u @ v / (np.linalg.norm(u) * np.linalg.norm(v)), -1, 1
                )
                ka = t.angles.params["ka"][r]
                if t.angles.params["is_linear"][r] > 0.5:
                    e += 143.9325 * ka * (1.0 + cosv)
                else:
                    dt = np.degrees(np.arccos(cosv)) - t.angles.params["theta0"][r]
                    e += 0.5 * 0.043844 * ka * dt * dt * (1.0 + cb * dt)
            for r in range(t.stretch_bends.n_terms):
                i, j, k = t.stretch_bends.atoms[r]
                u, v = p[i] - p[j], p[k] - p[j]
                rij, rkj = np.linalg.norm(u), np.linalg.norm(v)
                cosv = np.clip(u @ v / (rij * rkj), -1, 1)
                dt = np.degrees(np.arccos(cosv)) - t.stretch_bends.params["theta0"][r]
                e += 2.51210 * (
                    t.stretch_bends.params["kba_ijk"][r]
                    * (rij - t.stretch_bends.params["r0_ij"][r])
                    + t.stretch_bends.params["kba_kji"][r]
                    * (rkj - t.stretch_bends.params["r0_kj"][r])
                ) * dt
            for r in range(t.oop.n_terms):
                i, j, k, l = t.oop.atoms[r]
                rji, rjk, rjl = p[i] - p[j], p[k] - p[j], p[l] - p[j]
                nv = np.cross(rji, rjk)
                sin_chi = np.clip(
                    nv @ rjl / (np.linalg.norm(nv) * np.linalg.norm(rjl)),
                    -1, 1,
                )
                chi = np.degrees(np.arcsin(sin_chi))
                e += 0.5 * 0.043844 * t.oop.params["koop"][r] * chi * chi
            for r in range(t.torsions.n_terms):
                i, j, k, l = t.torsions.atoms[r]
                b1, b2, b3 = p[j] - p[i], p[k] - p[j], p[l] - p[k]
                n1, n2 = np.cross(b1, b2), np.cross(b2, b3)
                c = np.clip(
                    n1 @ n2 / (np.linalg.norm(n1) * np.linalg.norm(n2)), -1, 1
                )
                phi = np.arccos(c)
                e += 0.5 * (
                    t.torsions.params["v1"][r] * (1.0 + np.cos(phi))
                    + t.torsions.params["v2"][r] * (1.0 - np.cos(2 * phi))
                    + t.torsions.params["v3"][r] * (1.0 + np.cos(3 * phi))
                )
            for r in range(t.vdw.n_terms):
                i, j = t.vdw.atoms[r]
                rr = max(np.linalg.norm(p[i] - p[j]), 0.1)
                rstar = t.vdw.params["rstar"][r]
                eps = t.vdw.params["eps"][r]
                ratio = 1.07 * rstar / (rr + 0.07 * rstar)
                e += eps * ratio**7 * (
                    1.12 * rstar**7 / (rr**7 + 0.12 * rstar**7) - 2.0
                )
            for r in range(t.ele.n_terms):
                i, j = t.ele.atoms[r]
                rr = max(np.linalg.norm(p[i] - p[j]), 0.1)
                scale = 0.75 if t.ele.params["is_1_4"][r] > 0.5 else 1.0
                e += 332.0716 * t.ele.params["qq"][r] * scale / (rr + 0.05)
            return e

        for k, m in enumerate(mols):
            ref = scalar_energy(m, np.asarray(m.conformers[0], np.float64))
            assert abs(e_dev[k] - ref) < max(2e-2, 2e-4 * abs(ref)), (
                k, e_dev[k], ref
            )
