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
