"""Batched BFGS tests: analytic problems + real UFF molecules.

Mirrors the reference's ``test_bfgs_minimizer.cu`` (convergence vs RDKit
BFGS); oracles here are closed-form minima and energy-decrease checks.
"""
import math

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nvmolkit_tpu.chem import mol_from_smiles
from nvmolkit_tpu.models.uff import make_batched_uff
from nvmolkit_tpu.models.uff.energy import uff_energy_and_grad
from nvmolkit_tpu.ops.bfgs import batched_bfgs_minimize


def test_quadratic_bowl():
    # E = sum (x - c)^2 per system, different centers
    S, A = 4, 2
    centers = jnp.asarray(np.arange(S * A * 3, dtype=np.float32).reshape(S, A, 3) / 10.0)

    def eg(p):
        d = p - centers
        e = jnp.sum(d * d, axis=(1, 2))
        return e, 2 * d

    pos0 = jnp.zeros((S, A, 3), dtype=jnp.float32)
    mask = jnp.ones((S, A), dtype=bool)
    res = batched_bfgs_minimize(eg, pos0, mask, max_iters=100)
    assert np.asarray(res.converged).all()
    np.testing.assert_allclose(np.asarray(res.positions), np.asarray(centers), atol=1e-3)
    assert np.asarray(res.energies).max() < 1e-5


def test_rosenbrock_like():
    # stiffer anisotropic quadratic: E = 100 x^2 + y^2 + 0.01 z^2
    S, A = 2, 1
    w = jnp.asarray([100.0, 1.0, 0.01])

    def eg(p):
        e = jnp.sum(w * p * p, axis=(1, 2))
        return e, 2 * w * p

    pos0 = jnp.full((S, A, 3), 3.0, dtype=jnp.float32)
    mask = jnp.ones((S, A), dtype=bool)
    res = batched_bfgs_minimize(eg, pos0, mask, max_iters=200)
    assert np.asarray(res.energies).max() < 1e-4


def test_mixed_convergence_masking():
    # system 0: trivial; system 1: needs more iterations — both must land
    S, A = 2, 1

    def eg(p):
        x = p.reshape(S, 3)
        stiff = jnp.asarray([[1.0, 1.0, 1.0], [1000.0, 0.1, 10.0]])
        e = jnp.sum(stiff * x * x, axis=1)
        return e, (2 * stiff * x).reshape(S, A, 3)

    pos0 = jnp.ones((S, A, 3), dtype=jnp.float32)
    mask = jnp.ones((S, A), dtype=bool)
    res = batched_bfgs_minimize(eg, pos0, mask, max_iters=300)
    assert np.asarray(res.energies).max() < 1e-3


def _lattice(n, rng, spacing=1.6):
    side = math.ceil(n ** (1 / 3))
    grid = np.array(
        [(x, y, z) for x in range(side) for y in range(side) for z in range(side)],
        dtype=np.float64,
    )[:n]
    return grid * spacing + (rng.random((n, 3)) - 0.5) * 0.4


def test_uff_minimization_relaxes_bonds(rng):
    smiles = ["CCO", "CCCC", "c1ccccc1"]
    mols = [mol_from_smiles(s) for s in smiles]
    A = 16
    batch = make_batched_uff(mols, max_atoms=A)
    pos0 = np.zeros((3, A, 3), dtype=np.float32)
    for i, m in enumerate(mols):
        pos0[i, : m.num_atoms] = _lattice(m.num_atoms, rng)

    def eg(p):
        return uff_energy_and_grad(p, batch)

    mask = np.asarray(batch.atom_mask)
    e_start, _ = eg(jnp.asarray(pos0))
    res = batched_bfgs_minimize(eg, jnp.asarray(pos0), jnp.asarray(mask), max_iters=400)
    e_end = np.asarray(res.energies)
    assert (e_end < np.asarray(e_start)).all()
    assert (e_end < 50.0).all()  # relaxed structures have low strain

    # bond lengths near natural values for ethanol
    from nvmolkit_tpu.models.uff import build_uff_terms

    terms = build_uff_terms(mols[0])
    pos = np.asarray(res.positions)[0]
    for t in range(terms.bonds.n_terms):
        i, j = terms.bonds.atoms[t]
        r = np.linalg.norm(pos[i] - pos[j])
        r0 = terms.bonds.params["r0"][t]
        assert abs(r - r0) < 0.1, f"bond {i}-{j}: {r:.3f} vs r0 {r0:.3f}"


def test_benzene_planarity(rng):
    m = mol_from_smiles("c1ccccc1")
    A = 8
    batch = make_batched_uff([m], max_atoms=A)
    pos0 = np.zeros((1, A, 3), dtype=np.float32)
    # start from a ruffled hexagon
    for i in range(6):
        ang = i * math.pi / 3
        pos0[0, i] = (1.4 * math.cos(ang), 1.4 * math.sin(ang), 0.3 * (-1) ** i)

    def eg(p):
        return uff_energy_and_grad(p, batch)

    res = batched_bfgs_minimize(eg, jnp.asarray(pos0), jnp.asarray(np.asarray(batch.atom_mask)), max_iters=300)
    pos = np.asarray(res.positions)[0, :6]
    # fit plane through centroid; max deviation should be tiny
    centered = pos - pos.mean(axis=0)
    _, s, _ = np.linalg.svd(centered)
    assert s[2] < 0.05  # nearly planar
    # ring bond lengths ~1.40 A (aromatic C_R-C_R)
    for i in range(6):
        r = np.linalg.norm(pos[i] - pos[(i + 1) % 6])
        assert abs(r - 1.40) < 0.06


def test_lbfgs_matches_bfgs_on_quadratic():
    from nvmolkit_tpu.ops.lbfgs import batched_lbfgs_minimize

    S, A = 3, 2
    centers = jnp.asarray(
        np.arange(S * A * 3, dtype=np.float32).reshape(S, A, 3) / 7.0
    )

    def eg(p, _):
        d = p - centers
        return jnp.sum(d * d, axis=(1, 2)), 2 * d

    pos0 = jnp.zeros((S, A, 3), dtype=jnp.float32)
    mask = jnp.ones((S, A), dtype=bool)
    res = batched_lbfgs_minimize(eg, pos0, mask, max_iters=100, energy_args={})
    assert np.asarray(res.converged).all()
    np.testing.assert_allclose(np.asarray(res.positions), np.asarray(centers), atol=1e-3)


def test_compacting_driver_matches_plain(rng):
    from nvmolkit_tpu.chem import mol_from_smiles
    from nvmolkit_tpu.models.uff.energy import make_batched_uff, uff_energy_and_grad
    from nvmolkit_tpu.ops.minimize_driver import minimize_compacting

    mols = [mol_from_smiles(s) for s in ["CCO", "CCCC", "c1ccccc1", "CC(=O)O"] * 3]
    A = 16
    batch = make_batched_uff(mols, max_atoms=A)
    pos0 = np.zeros((len(mols), A, 3), dtype=np.float32)
    for i, m in enumerate(mols):
        pos0[i, : m.num_atoms] = _lattice(m.num_atoms, rng)
    res = minimize_compacting(
        uff_energy_and_grad, jnp.asarray(pos0), batch.atom_mask, batch,
        max_iters=300, backend="lbfgs", phase1_iters=30,
    )
    e = np.asarray(res.energies)
    assert np.asarray(res.converged).sum() >= 10
    assert (e < 60.0).all()
    with pytest.raises(ValueError):
        minimize_compacting(
            uff_energy_and_grad, jnp.asarray(pos0), batch.atom_mask, batch,
            backend="nope",
        )


def test_reminimizing_converged_batch_exits_fast():
    """Re-minimizing an already-minimized batch must exit in a handful
    of steps (entry gradient test + functional-decrease convergence) —
    a straggler grinding max_iters noise-floor accepts once cost 15x
    the fresh-minimization time through the public API.

    Uses a LOCAL fixed-seed rng, not the session fixture: this is a
    step-count contract, and whether each system converges via the
    gradient test (instant re-entry) or the functional-decrease test
    (legitimate extra re-entry work) depends on the exact random start
    — the session rng's state here varies with which tests ran first."""
    import numpy as _np

    import jax.numpy as jnp
    from nvmolkit_tpu.chem import mol_from_smiles
    from nvmolkit_tpu.models.uff.energy import make_batched_uff, uff_energy_and_grad
    from nvmolkit_tpu.ops.lbfgs_flat import batched_lbfgs_flat_minimize

    local_rng = _np.random.default_rng(0xC0FFEE)
    mols = [mol_from_smiles(s) for s in ("CCCCO", "CC(C)CO", "CCOCC")] * 4
    A = 16
    pos = jnp.asarray(
        local_rng.standard_normal((len(mols), A, 3)).astype("float32") * 1.5
    )
    batch = make_batched_uff(mols, A)
    first = batched_lbfgs_flat_minimize(
        uff_energy_and_grad, pos, batch.atom_mask, max_iters=200,
        energy_args=batch, max_steps=4000,
    )
    assert bool(first.converged.all())
    again = batched_lbfgs_flat_minimize(
        uff_energy_and_grad, first.positions, batch.atom_mask, max_iters=200,
        energy_args=batch, max_steps=4000,
    )
    assert bool(again.converged.all())
    assert int(again.n_iters) <= max(20, int(first.n_iters) // 4)
    # and the energies did not drift upward
    import numpy as np
    assert np.all(np.asarray(again.energies) <= np.asarray(first.energies) + 1e-3)


def test_flat_compaction_bit_identical():
    """The in-program straggler compaction (phase split + rank/gather/
    scatter) must return BIT-IDENTICAL per-system results to the
    uncompacted loop: every step-body op is per-system, so regrouping
    rows can only change wall time."""
    from nvmolkit_tpu.models.uff.energy import make_batched_uff, uff_energy_and_grad
    from nvmolkit_tpu.ops.lbfgs_flat import batched_lbfgs_flat_minimize

    local_rng = np.random.default_rng(17)
    mols = [
        mol_from_smiles(s)
        for s in ("CCO", "CCCC", "c1ccccc1", "CC(=O)O", "CCN", "CCOC") * 8
    ]
    A = 16
    batch = make_batched_uff(mols, A)
    pos = jnp.asarray(
        local_rng.standard_normal((len(mols), A, 3)).astype("float32") * 1.5
    )
    plain = batched_lbfgs_flat_minimize(
        uff_energy_and_grad, pos, batch.atom_mask, max_iters=200,
        energy_args=batch, compact_after=0,
    )
    compacted = batched_lbfgs_flat_minimize(
        uff_energy_and_grad, pos, batch.atom_mask, max_iters=200,
        energy_args=batch, compact_after=24,
    )
    np.testing.assert_array_equal(
        np.asarray(plain.positions), np.asarray(compacted.positions)
    )
    np.testing.assert_array_equal(
        np.asarray(plain.energies), np.asarray(compacted.energies)
    )
    np.testing.assert_array_equal(
        np.asarray(plain.converged), np.asarray(compacted.converged)
    )
