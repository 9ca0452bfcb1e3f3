"""Conformer RMSD + TFD tests (reference: ``test_conformer_rmsd.py``,
``test_tfd.py`` roles; oracles are geometric identities)."""
import math

import numpy as np
import pytest

from nvmolkit_tpu.chem import mol_from_smiles
from nvmolkit_tpu.conformerRmsd import GetConformerRMSMatrix, GetConformerRMSMatrixBatch
from nvmolkit_tpu.tfd import GetTFDMatrix, GetTFDMatrices


def _rot(theta):
    c, s = math.cos(theta), math.sin(theta)
    return np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]])


@pytest.fixture()
def butane_confs(rng):
    m = mol_from_smiles("CCCC")
    base = np.array(
        [[0, 0, 0], [1.53, 0, 0], [2.04, 1.44, 0], [3.57, 1.44, 0.0]], float
    )
    m.add_conformer(base)
    # rotated+translated copy: RMSD must be ~0 after Kabsch
    m.add_conformer(base @ _rot(0.8).T + np.array([5.0, -3.0, 2.0]))
    # genuinely different: twist the last atom out of plane
    twisted = base.copy()
    twisted[3] = [3.0, 1.44, 1.2]
    m.add_conformer(twisted)
    return m


def test_rmsd_identity_under_rigid_motion(butane_confs):
    rms = GetConformerRMSMatrix(butane_confs).numpy()
    # condensed (i,j): (1,0), (2,0), (2,1)
    assert rms.shape == (3,)
    assert rms[0] < 1e-3          # rotated copy aligns exactly
    assert rms[1] > 0.1           # twisted differs
    assert abs(rms[1] - rms[2]) < 1e-3  # conf1 == conf0 up to rigid motion


def test_rmsd_prealigned_differs(butane_confs):
    aligned = GetConformerRMSMatrix(butane_confs, prealigned=False).numpy()
    plain = GetConformerRMSMatrix(butane_confs, prealigned=True).numpy()
    assert plain[0] > aligned[0] + 1.0  # translation not removed


def test_rmsd_batch_matches_single(butane_confs):
    # own seeded generator: drawing from the shared session rng makes
    # this test's geometry depend on how much earlier tests consumed
    # (a near-degenerate 3-point cloud trips Kabsch's f32 tolerance)
    rng = np.random.default_rng(1234)
    m2 = mol_from_smiles("CCO")
    c = rng.random((3, 3))
    m2.add_conformer(c)
    m2.add_conformer(c + rng.random(3) * 0.1)
    batch = GetConformerRMSMatrixBatch([butane_confs, m2])
    single0 = GetConformerRMSMatrix(butane_confs).numpy()
    single1 = GetConformerRMSMatrix(m2).numpy()
    np.testing.assert_allclose(batch[0].numpy(), single0, atol=1e-5)
    np.testing.assert_allclose(batch[1].numpy(), single1, atol=1e-5)


def test_rmsd_heavy_atoms_only():
    m = mol_from_smiles("CC")
    a = np.array([[0, 0, 0], [1.5, 0, 0]], float)
    m.add_conformer(a)
    m.add_conformer(a + 1.0)
    rms = GetConformerRMSMatrix(m, heavyAtomsOnly=True).numpy()
    assert rms[0] < 1e-3  # rigid translation


def test_rmsd_requires_two_conformers():
    m = mol_from_smiles("CC")
    m.add_conformer(np.zeros((2, 3)))
    with pytest.raises(ValueError):
        GetConformerRMSMatrix(m)


def _butane_with_dihedrals(phis):
    """Butane conformers with specified C-C-C-C dihedral angles."""
    m = mol_from_smiles("CCCC")
    r, theta = 1.53, math.radians(112)
    for phi_deg in phis:
        phi = math.radians(phi_deg)
        p0 = np.array([r * math.cos(theta), r * math.sin(theta), 0.0])
        p1 = np.array([0.0, 0.0, 0.0])
        p2 = np.array([r, 0.0, 0.0])
        p3 = p2 + np.array(
            [
                -r * math.cos(theta),
                r * math.sin(theta) * math.cos(phi),
                r * math.sin(theta) * math.sin(phi),
            ]
        ) * -1.0 + np.array([r * math.cos(theta) * 0, 0, 0])
        # simpler: place p3 by rotating around the p1-p2 axis
        axis = np.array([1.0, 0, 0])
        v = np.array([math.cos(math.pi - theta), math.sin(math.pi - theta), 0.0]) * r
        c, s = math.cos(phi), math.sin(phi)
        rot = np.array([[1, 0, 0], [0, c, -s], [0, s, c]])
        p3 = p2 + rot @ v
        m.add_conformer(np.stack([p0, p1, p2, p3]))
    return m


def test_tfd_dihedral_sensitivity():
    m = _butane_with_dihedrals([60.0, 60.0, 180.0])
    tfd = GetTFDMatrix(m, useWeights=False).numpy()
    # (1,0): same dihedral -> 0; (2,0)/(2,1): 120 deg / 180 maxdev = 2/3
    assert tfd[0] < 1e-4
    assert tfd[1] == pytest.approx(120.0 / 180.0, abs=1e-3)
    assert tfd[2] == pytest.approx(120.0 / 180.0, abs=1e-3)


def test_tfd_circular_wrap():
    m = _butane_with_dihedrals([179.0, -179.0])
    tfd = GetTFDMatrix(m, useWeights=False).numpy()
    assert tfd[0] == pytest.approx(2.0 / 180.0, abs=1e-3)  # wraps to 2 deg


def test_tfd_no_torsions_is_zero():
    m = mol_from_smiles("CO")  # no torsion (both termini degree 1... C has O only)
    m.add_conformer(np.array([[0, 0, 0], [1.4, 0, 0.0]]))
    m.add_conformer(np.array([[0, 0, 0], [0, 1.4, 0.0]]))
    tfd = GetTFDMatrix(m).numpy()
    assert tfd.shape == (1,)
    assert tfd[0] == 0.0


def test_tfd_batch(butane_confs):
    res = GetTFDMatrices([butane_confs, butane_confs])
    a, b = res[0].numpy(), res[1].numpy()
    np.testing.assert_allclose(a, b)
    assert a.shape == (3,)


def test_tfd_bad_maxdev():
    m = _butane_with_dihedrals([0.0, 10.0])
    with pytest.raises(ValueError):
        GetTFDMatrices([m], maxDev="nope")


# ---------------------------------------------------------------------------
# round 2: RDKit-parity TFD semantics (symmetry, rings, weights, colinear)
# ---------------------------------------------------------------------------

def test_torsion_symmetric_side_all_quartets():
    from nvmolkit_tpu.ops.tfd import TORSION_SYMMETRIC, enumerate_torsions

    # neopentane-like: C(C)(C)(C)-CC: the tBu side is 3 equivalent methyls
    m = mol_from_smiles("CC(C)(C)CC")
    ts = enumerate_torsions(m)
    # find the torsion around the quaternary-C to CH2 bond
    widths = np.diff(ts.quartet_starts)
    assert (widths >= 3).any(), "symmetric side should contribute >= 3 quartets"
    t = int(np.argmax(widths))
    assert ts.types[t] == TORSION_SYMMETRIC


def test_torsion_ring_enumeration():
    from nvmolkit_tpu.ops.tfd import TORSION_RING, enumerate_torsions

    m = mol_from_smiles("C1CCCCC1")  # cyclohexane: no rotatable bonds
    ts = enumerate_torsions(m)
    assert ts.n_torsions == 1
    assert ts.types[0] == TORSION_RING
    # 6 consecutive quartets around the ring
    assert ts.quartet_starts[1] - ts.quartet_starts[0] == 6
    # maxDev = 180 * exp(-0.025 * (6-14)^2)
    assert abs(ts.max_dev[0] - 180.0 * math.exp(-0.025 * 64)) < 1e-3


def test_torsion_weights_decay_from_center():
    from nvmolkit_tpu.ops.tfd import enumerate_torsions

    # linear chain: central bond gets weight 1, terminal bonds decay
    m = mol_from_smiles("CCCCCCCC")
    ts = enumerate_torsions(m, use_weights=True)
    assert ts.n_torsions >= 3
    w = np.asarray(ts.weights)
    assert w.max() <= 1.0 + 1e-6
    assert w.min() < w.max()  # distal torsions weigh less


def test_ignore_colinear_bonds():
    from nvmolkit_tpu.ops.tfd import enumerate_torsions

    m = mol_from_smiles("CC#CC")  # butyne: only colinear candidate bonds
    ts_skip = enumerate_torsions(m, ignore_colinear_bonds=True)
    assert ts_skip.n_torsions == 0


def test_dihedral_convention_0_360():
    import jax.numpy as jnp
    from nvmolkit_tpu.ops.tfd import dihedral_angles

    # Reference convention (tfd_detail.h computeDihedralAngle): the
    # normals n1 = (p1-p2) x b1 and n2 = b1 x (p4-p3) are ANTI-parallel
    # for a planar cis quartet, so cis reads 180 and trans reads 0 —
    # which makes planar ring quartets read 180 (|angle - 180| = 0 in
    # the Ring averaging rule).
    cis = np.asarray(
        [[[-0.5, 1.0, 0.0], [0.0, 0.0, 0.0], [1.5, 0.0, 0.0], [2.0, 1.0, 0.0]]],
        np.float32,
    )
    trans = cis.copy()
    trans[0, 3] = (2.0, -1.0, 0.0)
    q = jnp.asarray(np.zeros((1, 1, 4), np.int32))
    q = q.at[0, 0].set(jnp.asarray([0, 1, 2, 3]))
    a_cis = float(dihedral_angles(jnp.asarray(cis), q)[0, 0, 0])
    a_trans = float(dihedral_angles(jnp.asarray(trans), q)[0, 0, 0])
    assert abs(a_cis - 180.0) < 1e-3
    assert abs(a_trans) < 1e-3 or abs(a_trans - 360.0) < 1e-3
    # out-of-plane quartet lands in [0, 360)
    skew = cis.copy()
    skew[0, 3] = (2.0, 0.7, 0.7)
    a_skew = float(dihedral_angles(jnp.asarray(skew), q)[0, 0, 0])
    assert 0.0 <= a_skew < 360.0 and min(a_skew, 360 - a_skew) > 1.0


def test_tfd_symmetric_min_rule():
    """A 120-degree rotation of a 3-fold symmetric side has TFD ~ 0."""
    import jax.numpy as jnp
    from nvmolkit_tpu.ops.tfd import tfd_matrix_condensed

    # synthetic: one symmetric torsion with 3 quartets whose angles are
    # shifted by 120 degrees between the two conformers
    angles = np.zeros((2, 1, 3), np.float32)
    angles[0, 0] = (10.0, 130.0, 250.0)
    angles[1, 0] = (130.0, 250.0, 10.0)
    out = tfd_matrix_condensed(
        jnp.asarray(angles),
        jnp.asarray(np.ones((1, 3), bool)),
        jnp.asarray(np.asarray([2], np.int32)),      # Symmetric
        jnp.asarray(np.ones(1, np.float32)),
        jnp.asarray(np.full(1, 180.0, np.float32)),
        jnp.asarray(np.ones(1, bool)),
        jnp.asarray(np.asarray([[1, 0]], np.int32)),
    )
    assert float(out[0]) < 1e-5


def test_tfd_ring_average_rule():
    import jax.numpy as jnp
    from nvmolkit_tpu.ops.tfd import tfd_matrix_condensed

    angles = np.zeros((2, 1, 2), np.float32)
    angles[0, 0] = (120.0, 240.0)   # |a-180| = 60, 60 -> avg 60
    angles[1, 0] = (150.0, 210.0)   # avg 30
    out = tfd_matrix_condensed(
        jnp.asarray(angles),
        jnp.asarray(np.ones((1, 2), bool)),
        jnp.asarray(np.asarray([1], np.int32)),      # Ring
        jnp.asarray(np.ones(1, np.float32)),
        jnp.asarray(np.full(1, 90.0, np.float32)),
        jnp.asarray(np.ones(1, bool)),
        jnp.asarray(np.asarray([[1, 0]], np.int32)),
    )
    assert abs(float(out[0]) - (60.0 - 30.0) / 90.0) < 1e-5


def test_tfd_spec_max_dev():
    from nvmolkit_tpu.ops.tfd import enumerate_torsions

    # isopropyl side (2 equivalent methyls) in spec mode: maxDev 90
    m = mol_from_smiles("CC(C)CCO")
    ts = enumerate_torsions(m, max_dev="spec")
    assert 90.0 in set(np.asarray(ts.max_dev).tolist())


def test_tfd_args_are_honored():
    """symmRadius and ignoreColinearBonds change results (no longer no-ops)."""
    from nvmolkit_tpu.ops.tfd import enumerate_torsions

    m = mol_from_smiles("CC#CCC")  # pent-2-yne: walking past the triple bond
    ts_true = enumerate_torsions(m, ignore_colinear_bonds=True)
    ts_false = enumerate_torsions(m, ignore_colinear_bonds=False)
    assert ts_false.n_torsions >= ts_true.n_torsions
