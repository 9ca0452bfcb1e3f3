"""MMFF94 tests: closed-form term values with hand-set parameters +
finite-difference gradients + API smoke (reference ``test_mmff.cu`` role,
with analytic oracles instead of RDKit)."""
import math

import numpy as np
import pytest

import jax.numpy as jnp

from nvmolkit_tpu.chem import mol_from_smiles
from nvmolkit_tpu.mmffOptimization import MMFFOptimizeMoleculesConfs
from nvmolkit_tpu.batchedForcefield import MMFFBatchedForcefield
from nvmolkit_tpu.models.mmff import (
    MMFFProperties,
    batch_mmff_terms,
    mmff_energy,
    mmff_energy_and_grad,
    mmff_terms_from_arrays,
)


def _single_term_batch(n_atoms=8, **kind):
    terms = mmff_terms_from_arrays(n_atoms, **kind)
    return batch_mmff_terms([terms], [n_atoms], n_atoms)


def _e(batch, pos):
    return float(np.asarray(mmff_energy(jnp.asarray(pos[None], jnp.float32), batch))[0])


def test_bond_stretch_exact():
    kb, r0, dr = 4.5, 1.5, 0.08
    batch = _single_term_batch(bonds=(np.array([[0, 1]]), {"r0": [r0], "kb": [kb]}))
    pos = np.zeros((8, 3))
    pos[1, 0] = r0 + dr
    cs = -2.0
    want = 0.5 * 143.9325 * kb * dr**2 * (1 + cs * dr + 7 / 12 * cs**2 * dr**2)
    assert _e(batch, pos) == pytest.approx(want, rel=1e-5)


def test_angle_bend_exact():
    ka, theta0 = 0.8, 109.5
    batch = _single_term_batch(
        angles=(np.array([[0, 1, 2]]), {"theta0": [theta0], "ka": [ka], "is_linear": [0.0]})
    )
    theta = 115.0
    pos = np.zeros((8, 3))
    pos[0] = (1.5, 0, 0)
    pos[2] = (1.5 * math.cos(math.radians(theta)), 1.5 * math.sin(math.radians(theta)), 0)
    dt = theta - theta0
    want = 0.5 * 0.043844 * ka * dt**2 * (1 - 0.006981317 * dt)
    assert _e(batch, pos) == pytest.approx(want, rel=1e-4)


def test_linear_angle_form():
    ka = 0.5
    batch = _single_term_batch(
        angles=(np.array([[0, 1, 2]]), {"theta0": [180.0], "ka": [ka], "is_linear": [1.0]})
    )
    pos = np.zeros((8, 3))
    pos[0] = (1.2, 0, 0)
    pos[2] = (-1.2, 0.0001, 0)  # ~linear
    assert _e(batch, pos) == pytest.approx(0.0, abs=1e-3)
    pos[2] = (0, 1.2, 0)  # 90 degrees
    assert _e(batch, pos) == pytest.approx(143.9325 * ka * 1.0, rel=1e-3)


def test_torsion_exact():
    v1, v2, v3 = 0.3, 0.6, 0.9
    batch = _single_term_batch(
        torsions=(np.array([[0, 1, 2, 3]]), {"v1": [v1], "v2": [v2], "v3": [v3]})
    )
    phi = math.radians(40.0)
    pos = np.zeros((8, 3))
    pos[0] = (1, 1, 0)
    pos[1] = (1, 0, 0)
    pos[2] = (2, 0, 0)
    pos[3] = (2 + math.cos(0.1) * 0, 1 * math.cos(phi), 1 * math.sin(phi))
    pos[3] = (2.0, math.cos(phi), math.sin(phi))
    want = 0.5 * (
        v1 * (1 + math.cos(phi)) + v2 * (1 - math.cos(2 * phi)) + v3 * (1 + math.cos(3 * phi))
    )
    assert _e(batch, pos) == pytest.approx(want, rel=1e-4)


def test_vdw_minimum_at_rstar():
    rstar, eps = 3.8, 0.1
    batch = _single_term_batch(vdw=(np.array([[0, 1]]), {"rstar": [rstar], "eps": [eps]}))

    def e(r):
        pos = np.zeros((8, 3))
        pos[1, 0] = r
        return _e(batch, pos)

    # minimum at R* with depth -eps
    assert e(rstar) == pytest.approx(-eps, rel=1e-3)
    assert e(rstar) < e(rstar * 0.9)
    assert e(rstar) < e(rstar * 1.1)


def test_electrostatics_constant_and_distance_diel():
    qq = 0.25
    for model, power in ((1, 1), (2, 2)):
        props = MMFFProperties(dielModel=model)
        terms = mmff_terms_from_arrays(
            4, ele=(np.array([[0, 1]]), {"qq": [qq], "is_1_4": [0.0]})
        )
        batch = batch_mmff_terms([terms], [4], 4, props)
        pos = np.zeros((4, 3))
        pos[1, 0] = 3.0
        want = 332.0716 * qq / (3.05**power)
        assert _e(batch, pos) == pytest.approx(want, rel=1e-4)


def test_ele_1_4_scaling():
    qq = 0.1
    terms = mmff_terms_from_arrays(
        4, ele=(np.array([[0, 1]]), {"qq": [qq], "is_1_4": [1.0]})
    )
    batch = batch_mmff_terms([terms], [4], 4)
    pos = np.zeros((4, 3))
    pos[1, 0] = 2.0
    want = 0.75 * 332.0716 * qq / 2.05
    assert _e(batch, pos) == pytest.approx(want, rel=1e-4)


def test_oop_zero_when_planar():
    batch = _single_term_batch(
        oop=(np.array([[0, 1, 2, 3]]), {"koop": [0.5]})
    )
    pos = np.zeros((8, 3))
    pos[0] = (1, 0, 0)
    pos[2] = (-0.5, 0.9, 0)
    pos[3] = (-0.5, -0.9, 0)  # all in z=0 plane
    assert _e(batch, pos) == pytest.approx(0.0, abs=1e-4)
    pos[3] = (-0.5, -0.9, 0.4)
    assert _e(batch, pos) > 0.01


def test_stretch_bend_sign():
    terms = mmff_terms_from_arrays(
        8,
        stretch_bends=(
            np.array([[0, 1, 2]]),
            {
                "kba_ijk": [0.2],
                "kba_kji": [0.2],
                "r0_ij": [1.5],
                "r0_kj": [1.5],
                "theta0": [109.5],
            },
        ),
    )
    batch = batch_mmff_terms([terms], [8], 8)
    # stretch both bonds and open the angle: positive coupling energy
    theta = math.radians(120.0)
    pos = np.zeros((8, 3))
    pos[0] = (1.6, 0, 0)
    pos[2] = (1.6 * math.cos(theta), 1.6 * math.sin(theta), 0)
    want = 2.51210 * (0.2 * 0.1 + 0.2 * 0.1) * (120.0 - 109.5)
    assert _e(batch, pos) == pytest.approx(want, rel=1e-3)


def test_gradients_fd(rng):
    m = mol_from_smiles("CC(=O)O")
    from nvmolkit_tpu.models.mmff import make_batched_mmff

    A = 16
    batch = make_batched_mmff([m], A)
    side = math.ceil(m.num_atoms ** (1 / 3))
    grid = np.array(
        [(x, y, z) for x in range(side) for y in range(side) for z in range(side)],
        float,
    )[: m.num_atoms]
    pos = np.zeros((1, A, 3))
    pos[0, : m.num_atoms] = grid * 1.7 + (rng.random((m.num_atoms, 3)) - 0.5) * 0.4
    e, g = mmff_energy_and_grad(jnp.asarray(pos, jnp.float32), batch)
    g = np.asarray(g)
    assert np.isfinite(g).all()
    h = 1e-2
    for atom in range(3):
        for dim in range(3):
            pp, pm = pos.copy(), pos.copy()
            pp[0, atom, dim] += h
            pm[0, atom, dim] -= h
            ep = float(np.asarray(mmff_energy(jnp.asarray(pp, jnp.float32), batch))[0])
            em = float(np.asarray(mmff_energy(jnp.asarray(pm, jnp.float32), batch))[0])
            fd = (ep - em) / (2 * h)
            assert abs(fd - g[0, atom, dim]) / max(5.0, abs(fd)) < 5e-2


def test_mmff_optimize_api(rng):
    mols = [mol_from_smiles(s) for s in ["CCO", "CCCC"]]
    for m in mols:
        n = m.num_atoms
        side = math.ceil(n ** (1 / 3))
        grid = np.array(
            [(x, y, z) for x in range(side) for y in range(side) for z in range(side)],
            float,
        )[:n]
        m.add_conformer(grid * 1.6 + (rng.random((n, 3)) - 0.5) * 0.3)
    results, dense = MMFFOptimizeMoleculesConfs(mols, maxIters=300)
    e0 = MMFFBatchedForcefield(mols).compute_energy().numpy()
    for r in results:
        for status, energy in r:
            assert np.isfinite(energy)
    assert dense.positions.shape[0] == 2


def test_term_toggles():
    props = MMFFProperties(vdWTerm=False, eleTerm=False)
    terms = mmff_terms_from_arrays(
        4,
        bonds=(np.array([[0, 1]]), {"r0": [1.5], "kb": [4.0]}),
        vdw=(np.array([[0, 2]]), {"rstar": [3.5], "eps": [0.1]}),
    )
    batch = batch_mmff_terms([terms], [4], 4, props)
    assert "vdw" not in batch.tables
    assert "bonds" in batch.tables


def test_bad_variant():
    with pytest.raises(ValueError):
        MMFFProperties(mmffVariant="MMFF2000")


def test_per_molecule_properties_list():
    """Per-molecule MMFFProperties lists (reference
    nvmolkit/mmffOptimization.py:145-196) group by signature."""
    from nvmolkit_tpu.chem import mol_from_smiles
    from nvmolkit_tpu.embedMolecules import EmbedMolecules
    from nvmolkit_tpu.mmffOptimization import MMFFOptimizeMoleculesConfs
    from nvmolkit_tpu.models.mmff import MMFFProperties
    import numpy as np
    import pytest

    mols = [mol_from_smiles(s) for s in ("CCO", "CCCO", "CCN")]
    EmbedMolecules(mols, confsPerMolecule=2, maxIterations=10)
    props = [
        MMFFProperties(),
        MMFFProperties(eleTerm=False),
        MMFFProperties(),
    ]
    results, dense = MMFFOptimizeMoleculesConfs(mols, maxIters=100, properties=props)
    assert len(results) == 3
    for mi, m in enumerate(mols):
        assert len(results[mi]) == len(m.conformers)
        for status, e in results[mi]:
            assert status in (0, 1) and np.isfinite(e)
    # mismatched length raises
    with pytest.raises(ValueError):
        MMFFOptimizeMoleculesConfs(mols, properties=[MMFFProperties()])


def test_morgan_oversized_fallback():
    """Molecules beyond the largest bucket use the CPU fallback path."""
    from nvmolkit_tpu.chem import mol_from_smiles
    from nvmolkit_tpu.fingerprints import MorganFingerprintGenerator
    import numpy as np

    big = mol_from_smiles("C" * 300)  # 300-atom chain > 256 bucket
    small = mol_from_smiles("CCO")
    gen = MorganFingerprintGenerator(radius=2, fpSize=1024)
    fps = gen.GetFingerprints([small, big]).numpy()
    assert fps.shape == (2, 32)
    assert fps[1].any()
    # fallback result must agree with the CPU oracle
    from nvmolkit_tpu.ops.morgan_cpu import (
        morgan_fingerprint_cpu,
        morgan_fingerprint_cpu_unbounded,
    )
    assert (
        morgan_fingerprint_cpu_unbounded(small, 2, 1024)
        == morgan_fingerprint_cpu(small, 2, 1024)
    ).all()
