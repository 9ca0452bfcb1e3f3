"""Force-field constraint tests (reference ``forcefield_constraints``/
``test_batched_forcefield.py`` constraint-behavior role)."""
import math

import numpy as np
import pytest

from nvmolkit_tpu.batchedForcefield import UFFBatchedForcefield
from nvmolkit_tpu.chem import mol_from_smiles


def _butane_ff(rng):
    m = mol_from_smiles("CCCC")
    base = np.array(
        [[0, 0, 0], [1.53, 0, 0], [2.04, 1.44, 0], [3.57, 1.44, 0.2]], float
    )
    m.add_conformer(base + rng.random((4, 3)) * 0.05)
    return m


def test_distance_constraint_enforced(rng):
    m = _butane_ff(rng)
    ff = UFFBatchedForcefield([m])
    # force the 1-4 distance into a window well below the anti geometry
    # (but above hard vdW contact, which would overpower any constraint)
    ff[0].add_distance_constraint(0, 3, 2.6, 2.8, forceConstant=2000.0)
    ff.minimize(maxIters=500)
    pos = np.asarray(ff.positions)[0]
    d = np.linalg.norm(pos[0] - pos[3])
    assert 2.4 < d < 3.0


def test_constraint_energy_zero_inside_window(rng):
    m = _butane_ff(rng)
    ff_plain = UFFBatchedForcefield([m])
    ff = UFFBatchedForcefield([m])
    ff[0].add_distance_constraint(0, 1, 0.5, 5.0, forceConstant=100.0)  # wide window
    e_plain = ff_plain.compute_energy().numpy()
    e_con = ff.compute_energy().numpy()
    np.testing.assert_allclose(e_con, e_plain, rtol=1e-5)


def test_position_constraint_pins_atom(rng):
    m = _butane_ff(rng)
    ff = UFFBatchedForcefield([m])
    p0 = np.asarray(ff.positions)[0, 0].copy()
    ff[0].add_position_constraint(0, maxDispl=0.05, forceConstant=1000.0)
    ff.minimize(maxIters=400)
    p1 = np.asarray(ff.positions)[0, 0]
    assert np.linalg.norm(p1 - p0) < 0.2


def test_torsion_constraint_sets_dihedral(rng):
    m = _butane_ff(rng)
    ff = UFFBatchedForcefield([m])
    ff[0].add_torsion_constraint(0, 1, 2, 3, 55.0, 65.0, forceConstant=200.0)
    ff.minimize(maxIters=600)
    p = np.asarray(ff.positions)[0]
    b1, b2, b3 = p[1] - p[0], p[2] - p[1], p[3] - p[2]
    n1, n2 = np.cross(b1, b2), np.cross(b2, b3)
    m1 = np.cross(n1, b2 / np.linalg.norm(b2))
    phi = math.degrees(math.atan2(np.dot(m1, n2), np.dot(n1, n2)))
    assert 40.0 < abs(phi) < 80.0


def test_angle_constraint(rng):
    m = _butane_ff(rng)
    ff = UFFBatchedForcefield([m])
    ff[0].add_angle_constraint(0, 1, 2, 95.0, 100.0, forceConstant=500.0)
    ff.minimize(maxIters=500)
    p = np.asarray(ff.positions)[0]
    u, v = p[0] - p[1], p[2] - p[1]
    ang = math.degrees(
        math.acos(np.dot(u, v) / (np.linalg.norm(u) * np.linalg.norm(v)))
    )
    assert 90.0 < ang < 106.0


def test_relative_distance_constraint(rng):
    m = _butane_ff(rng)
    ff = UFFBatchedForcefield([m])
    d0 = float(np.linalg.norm(np.asarray(ff.positions)[0, 0] - np.asarray(ff.positions)[0, 3]))
    # window = current distance +/- 0.1
    ff[0].add_distance_constraint(0, 3, 0.1, 0.1, forceConstant=500.0, relative=True)
    ff.minimize(maxIters=400)
    p = np.asarray(ff.positions)[0]
    d = np.linalg.norm(p[0] - p[3])
    assert abs(d - d0) < 0.35


def test_constraint_validation(rng):
    m = _butane_ff(rng)
    ff = UFFBatchedForcefield([m])
    with pytest.raises(ValueError):
        ff[0].add_distance_constraint(0, 9, 1.0, 2.0, 10.0)
    with pytest.raises(IndexError):
        ff[5]


def test_per_molecule_maxiters_forcetol_broadcast(rng):
    """Scalar-or-list broadcasting (reference batchedForcefield.py:325-330):
    a tiny per-molecule iteration cap must leave that molecule unconverged
    while the generously-budgeted one converges."""
    from nvmolkit_tpu.chem import mol_from_smiles
    from nvmolkit_tpu.batchedForcefield import UFFBatchedForcefield
    import numpy as np
    import pytest

    mols = []
    for _ in range(2):
        m = mol_from_smiles("CCCCO")
        m.conformers = [
            (rng.standard_normal((m.num_atoms, 3)) * 1.5).astype(np.float32)
        ]
        mols.append(m)
    ff = UFFBatchedForcefield(mols)
    e, conv = ff.minimize(maxIters=[1, 300], forceTol=1e-4)
    conv = np.asarray(conv.numpy())
    assert not conv[0]       # capped at 1 iteration: cannot converge
    assert conv[1]

    with pytest.raises(ValueError, match="maxIters"):
        UFFBatchedForcefield(mols).minimize(maxIters=[1, 2, 3])
