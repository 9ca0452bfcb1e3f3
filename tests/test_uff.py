"""UFF force-field tests: analytic checks + finite-difference gradients.

Mirrors the reference's per-term differential strategy (``tests/test_uff.cu``
checks energies/gradients vs RDKit UFF; here the oracles are closed-form
term values and central finite differences of our own energy).
"""
import math

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nvmolkit_tpu.chem import mol_from_smiles
from nvmolkit_tpu.chem.mol import Atom, Mol, BondType
from nvmolkit_tpu.models.uff import build_uff_terms, make_batched_uff
from nvmolkit_tpu.models.uff.energy import uff_energy, uff_energy_and_grad


def _random_coords(n, rng, spacing=1.7, jitter=0.25):
    """Clash-free jittered-lattice coordinates (keeps f32 FD stable)."""
    side = math.ceil(n ** (1 / 3))
    grid = np.array(
        [(x, y, z) for x in range(side) for y in range(side) for z in range(side)],
        dtype=np.float64,
    )[:n]
    return grid * spacing + (rng.random((n, 3)) - 0.5) * 2 * jitter


def test_diatomic_bond_energy():
    m = Mol()
    m.add_atom(Atom(atomic_num=6))
    m.add_atom(Atom(atomic_num=6))
    m.add_bond(0, 1, BondType.SINGLE)
    m.finalize()
    terms = build_uff_terms(m)
    r0 = float(terms.bonds.params["r0"][0])
    k = float(terms.bonds.params["k"][0])
    assert 1.4 < r0 < 1.6  # C_3-C_3 ~ 1.51 A
    assert k > 100.0

    batch = make_batched_uff([m], max_atoms=8)
    # at r0: zero energy
    pos = np.zeros((1, 8, 3), dtype=np.float32)
    pos[0, 1, 0] = r0
    e = np.asarray(uff_energy(jnp.asarray(pos), batch))
    assert abs(e[0]) < 1e-4
    # displaced by dr: 0.5 k dr^2
    dr = 0.1
    pos[0, 1, 0] = r0 + dr
    e = np.asarray(uff_energy(jnp.asarray(pos), batch))
    assert e[0] == pytest.approx(0.5 * k * dr * dr, rel=1e-3)


def test_water_angle_minimum():
    m = mol_from_smiles("O")  # just O; use H2S-like triatomic instead
    m = Mol()
    m.add_atom(Atom(atomic_num=8, from_bracket=True))
    m.add_atom(Atom(atomic_num=1, from_bracket=True))
    m.add_atom(Atom(atomic_num=1, from_bracket=True))
    m.add_bond(0, 1)
    m.add_bond(0, 2)
    m.finalize()
    terms = build_uff_terms(m)
    r0 = float(terms.bonds.params["r0"][0])
    batch = make_batched_uff([m], max_atoms=8)
    theta0 = math.radians(104.51)

    def energy_at_angle(theta):
        pos = np.zeros((1, 8, 3), dtype=np.float32)
        pos[0, 1] = (r0, 0, 0)
        pos[0, 2] = (r0 * math.cos(theta), r0 * math.sin(theta), 0)
        return float(np.asarray(uff_energy(jnp.asarray(pos), batch))[0])

    e_min = energy_at_angle(theta0)
    assert e_min < energy_at_angle(theta0 + 0.2)
    assert e_min < energy_at_angle(theta0 - 0.2)
    assert abs(e_min) < 1e-3  # both bonds at r0, angle at theta0


@pytest.mark.parametrize("smiles", ["CCO", "c1ccccc1", "CC(=O)O", "CC(C)CC", "CS(=O)(=O)C"])
def test_gradients_finite_difference(smiles, rng):
    m = mol_from_smiles(smiles)
    n = m.num_atoms
    A = 32
    batch = make_batched_uff([m], max_atoms=A)
    pos = np.zeros((1, A, 3), dtype=np.float64)
    pos[0, :n] = _random_coords(n, rng)
    e, g = uff_energy_and_grad(jnp.asarray(pos, dtype=jnp.float32), batch)
    g = np.asarray(g)
    assert np.isfinite(np.asarray(e)).all()
    assert np.isfinite(g).all()
    assert (g[0, n:] == 0).all()  # padded atoms get zero grad

    # central differences on f32 energies: h large enough that the FD
    # signal dominates f32 eval noise (~E * 1e-7 / 2h)
    h = 1e-2
    for atom in range(min(n, 4)):
        for dim in range(3):
            pp = pos.copy()
            pp[0, atom, dim] += h
            pm = pos.copy()
            pm[0, atom, dim] -= h
            ep = float(np.asarray(uff_energy(jnp.asarray(pp, dtype=jnp.float32), batch))[0])
            em = float(np.asarray(uff_energy(jnp.asarray(pm, dtype=jnp.float32), batch))[0])
            fd = (ep - em) / (2 * h)
            scale = max(5.0, abs(fd))
            assert abs(fd - g[0, atom, dim]) / scale < 5e-2, (
                f"grad mismatch atom {atom} dim {dim}: fd={fd} ad={g[0, atom, dim]}"
            )


def test_energy_rigid_motion_invariance(rng):
    m = mol_from_smiles("CC(=O)Oc1ccccc1")
    n = m.num_atoms
    A = 32
    batch = make_batched_uff([m], max_atoms=A)
    pos = np.zeros((1, A, 3), dtype=np.float32)
    pos[0, :n] = _random_coords(n, rng)
    e0 = float(np.asarray(uff_energy(jnp.asarray(pos), batch))[0])

    # translation
    pos_t = pos.copy()
    pos_t[0, :n] += np.array([3.0, -2.0, 1.0], dtype=np.float32)
    e_t = float(np.asarray(uff_energy(jnp.asarray(pos_t), batch))[0])
    assert e_t == pytest.approx(e0, rel=1e-4, abs=1e-3)

    # rotation
    th = 0.7
    R = np.array(
        [[math.cos(th), -math.sin(th), 0], [math.sin(th), math.cos(th), 0], [0, 0, 1]],
        dtype=np.float32,
    )
    pos_r = pos.copy()
    pos_r[0, :n] = pos[0, :n] @ R.T
    e_r = float(np.asarray(uff_energy(jnp.asarray(pos_r), batch))[0])
    assert e_r == pytest.approx(e0, rel=1e-4, abs=1e-3)


def test_batch_matches_individual(rng):
    smiles = ["CCO", "c1ccccc1", "CC(=O)O"]
    mols = [mol_from_smiles(s) for s in smiles]
    A = 16
    batch = make_batched_uff(mols, max_atoms=A)
    pos = np.zeros((3, A, 3), dtype=np.float32)
    for i, m in enumerate(mols):
        pos[i, : m.num_atoms] = _random_coords(m.num_atoms, rng)
    e_batch = np.asarray(uff_energy(jnp.asarray(pos), batch))
    for i, m in enumerate(mols):
        single = make_batched_uff([m], max_atoms=A)
        e_i = np.asarray(uff_energy(jnp.asarray(pos[i : i + 1]), single))[0]
        assert e_batch[i] == pytest.approx(float(e_i), rel=1e-5, abs=1e-4)


def test_term_counts_ethane():
    m = mol_from_smiles("CC")  # ethane: 2C+6H after H... no explicit H
    # without explicit hydrogens: 1 bond, 0 angles, 0 torsions
    terms = build_uff_terms(m)
    assert terms.bonds.n_terms == 1
    assert terms.angles.n_terms == 0
    assert terms.torsions.n_terms == 0
    assert terms.vdw.n_terms == 0


def test_benzene_has_inversions_and_torsions():
    m = mol_from_smiles("c1ccccc1C")  # toluene skeleton
    terms = build_uff_terms(m)
    assert terms.inversions.n_terms > 0
    assert terms.torsions.n_terms > 0
    assert terms.angles.n_terms > 0


def test_unsupported_element_raises():
    from nvmolkit_tpu.models.uff import UFFBuildError

    m = Mol()
    m.add_atom(Atom(atomic_num=79, from_bracket=True))  # gold
    m.add_atom(Atom(atomic_num=6))
    m.add_bond(0, 1)
    m.finalize()
    with pytest.raises(UFFBuildError):
        build_uff_terms(m)


def test_vectorized_uff_typing_matches_oracle(smiles100):
    """uff_atom_codes (vectorized) must agree with the per-atom
    uff_atom_type oracle on every atom, and the vectorized bond orders
    in _uff_geom_arrays with the per-bond _bond_order oracle."""
    from nvmolkit_tpu.chem import mol_from_smiles
    from nvmolkit_tpu.chem.bounds import _uff_geom_arrays
    from nvmolkit_tpu.models.uff.builder import _bond_order
    from nvmolkit_tpu.models.uff.params import (
        _LABEL_ORDER,
        uff_atom_codes,
        uff_atom_type,
    )

    extra = [
        "CS(=O)(=O)C", "CSC", "CS(=O)C", "c1ccsc1",     # S tiers
        "CP(C)C", "CP(=O)(O)O",                          # P tiers
        "B(O)(O)O", "Cc1ccccc1B",                        # B (may fail arom)
        "CC(=O)NC", "CNC(=O)NC",                         # amides/urea
    ]
    for smi in list(smiles100) + extra:
        try:
            m = mol_from_smiles(smi)
        except ValueError:
            continue
        arrays = m.to_arrays()
        try:
            codes = uff_atom_codes(arrays)
        except Exception:
            # oracle must also fail
            import pytest as _pytest

            with _pytest.raises(Exception):
                for i in range(m.num_atoms):
                    uff_atom_type(m, i)
            continue
        for i in range(m.num_atoms):
            want = uff_atom_type(m, i).label
            got = _LABEL_ORDER[codes[i]]
            assert got == want, f"{smi} atom {i}: {got} != {want}"
        _r1, _chi, _t0, _vdw, order = _uff_geom_arrays(m)
        for bi, b in enumerate(m.bonds):
            assert order[bi] == _bond_order(m, b), f"{smi} bond {bi}"
