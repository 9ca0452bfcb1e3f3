"""Independent minimizer oracle: scipy.optimize L-BFGS-B.

The reference validates its batched BFGS against RDKit's minimizer
(``tests/test_bfgs_minimizer.cu``, SURVEY §4.1). RDKit is absent here;
scipy's L-BFGS-B is an equally independent reference optimizer — it
shares no code with ops/bfgs.py and exercises the same energy/gradient
callables, so systematic minimizer defects (bad line search, wrong
Hessian update, premature convergence) show up as scipy finding a
materially lower energy from the same start.
"""
import numpy as np
import pytest

import jax.numpy as jnp

from nvmolkit_tpu.chem import mol_from_smiles
from nvmolkit_tpu.ops.bfgs import batched_bfgs_minimize

scipy_opt = pytest.importorskip("scipy.optimize")


@pytest.fixture(scope="module")
def embedded_pair():
    from nvmolkit_tpu.embedMolecules import EmbedMolecules, EmbedParameters

    mols = [mol_from_smiles(s) for s in ("CCO", "CC(=O)NC")]
    EmbedMolecules(
        mols, EmbedParameters(randomSeed=11), confsPerMolecule=1,
        maxIterations=10,
    )
    return [m for m in mols if m.conformers]


def _scipy_minimize(e_of_flat, x0, maxiter=400):
    res = scipy_opt.minimize(
        e_of_flat, x0, jac=True, method="L-BFGS-B",
        options={"maxiter": maxiter},
    )
    return float(res.fun)


class TestScipyMinimizerOracle:
    def test_mmff_reaches_scipy_basin_energy(self, embedded_pair):
        from nvmolkit_tpu.models.mmff import (
            MMFFProperties, make_batched_mmff, mmff_energy_and_grad,
        )

        assert embedded_pair, "embedding produced no conformers"
        A = 16
        props = MMFFProperties()
        for m in embedded_pair:
            batch = make_batched_mmff([m], A, props)
            pos0 = np.zeros((1, A, 3), np.float32)
            pos0[0, : m.num_atoms] = m.conformers[0][: m.num_atoms]
            mask = np.zeros((1, A), bool)
            mask[0, : m.num_atoms] = True

            res = batched_bfgs_minimize(
                mmff_energy_and_grad, jnp.asarray(pos0), jnp.asarray(mask),
                max_iters=400, energy_args=batch,
            )
            e_repo = float(np.asarray(res.energies)[0])

            def e_of_flat(x):
                p = jnp.asarray(
                    x.reshape(1, A, 3), jnp.float32
                )
                e, g = mmff_energy_and_grad(p, batch)
                g = np.asarray(g, np.float64).ravel()
                # freeze padding lanes so scipy optimizes the same dofs
                g[~np.repeat(mask.ravel(), 3)] = 0.0
                return float(np.asarray(e)[0]), g

            e_scipy = _scipy_minimize(e_of_flat, pos0.ravel().astype(np.float64))
            e_start = e_of_flat(pos0.ravel().astype(np.float64))[0]
            assert e_repo < e_start, "minimizer did not descend"
            # Asymmetric on purpose: never materially WORSE than scipy
            # (0.5 kcal/mol covers the f32 contract + line-search
            # differences), but landing below scipy is legitimate — the
            # NR line search can hop to a deeper basin L-BFGS-B stops
            # short of (observed: 1.9 kcal/mol below on one fixture).
            # The lower bound is only a sanity net against a broken
            # energy function reporting absurdly low values.
            assert e_repo <= e_scipy + 0.5, (e_repo, e_scipy)
            assert e_repo >= e_scipy - 25.0, (e_repo, e_scipy)

    def test_uff_reaches_scipy_basin_energy(self, embedded_pair):
        from nvmolkit_tpu.models.uff import make_batched_uff
        from nvmolkit_tpu.models.uff.energy import uff_energy_and_grad

        assert embedded_pair
        m = embedded_pair[0]
        A = 16
        batch = make_batched_uff([m], max_atoms=A)
        pos0 = np.zeros((1, A, 3), np.float32)
        pos0[0, : m.num_atoms] = m.conformers[0][: m.num_atoms]
        mask = np.zeros((1, A), bool)
        mask[0, : m.num_atoms] = True

        def eg(p):
            return uff_energy_and_grad(p, batch)

        res = batched_bfgs_minimize(
            eg, jnp.asarray(pos0), jnp.asarray(mask), max_iters=400
        )
        e_repo = float(np.asarray(res.energies)[0])

        def e_of_flat(x):
            p = jnp.asarray(x.reshape(1, A, 3), jnp.float32)
            e, g = uff_energy_and_grad(p, batch)
            g = np.asarray(g, np.float64).ravel()
            g[~np.repeat(mask.ravel(), 3)] = 0.0
            return float(np.asarray(e)[0]), g

        e_scipy = _scipy_minimize(e_of_flat, pos0.ravel().astype(np.float64))
        e_start = e_of_flat(pos0.ravel().astype(np.float64))[0]
        assert e_repo < e_start
        assert e_repo <= e_scipy + 0.5, (e_repo, e_scipy)

    def test_quadratic_agrees_exactly(self):
        """On a convex quadratic both optimizers must find THE minimum."""
        rng = np.random.default_rng(3)
        A = 4
        target = rng.normal(size=(1, A, 3)).astype(np.float32)

        def eg(p):
            d = p - jnp.asarray(target)
            e = jnp.sum(d * d, axis=(1, 2))
            return e, 2.0 * d

        pos0 = jnp.zeros((1, A, 3), jnp.float32)
        mask = jnp.ones((1, A), bool)
        res = batched_bfgs_minimize(eg, pos0, mask, max_iters=100)
        e_repo = float(np.asarray(res.energies)[0])

        def e_of_flat(x):
            d = x.reshape(1, A, 3) - target.astype(np.float64)
            return float(np.sum(d * d)), (2.0 * d).ravel()

        e_scipy = _scipy_minimize(e_of_flat, np.zeros(A * 3))
        assert abs(e_repo - e_scipy) < 1e-4
        assert e_repo < 1e-4


class TestConvergenceFlagParity:
    """Round-4 directive: the batched minimizer's `converged` flags must
    agree with the independent scipy L-BFGS-B oracle on the same starts
    (same energy callable, comparable budgets). RDKit also returns
    non-converged systems at finite maxIters; what this guards is a
    systematic flag defect (always-true exits at the noise floor, or
    line-search failures misreported as convergence)."""

    def test_converged_flags_agree_with_scipy(self):
        from nvmolkit_tpu.chem.native import mols_from_smiles
        from nvmolkit_tpu.embedMolecules import EmbedMolecules, EmbedParameters
        from nvmolkit_tpu.models.mmff import (
            MMFFProperties, make_batched_mmff, mmff_energy_and_grad,
        )
        from nvmolkit_tpu.ops.lbfgs_flat import batched_lbfgs_flat_minimize

        import sys
        from pathlib import Path

        sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "benchmarks"))
        from _common import make_smiles

        mols = mols_from_smiles(make_smiles(48))
        EmbedMolecules(
            mols, EmbedParameters(randomSeed=7), confsPerMolecule=1,
            maxIterations=8,
        )
        mols = [m for m in mols if m.conformers][:40]
        assert len(mols) >= 32
        A = 32
        batch = make_batched_mmff(mols, A, MMFFProperties())
        S = len(mols)
        pos0 = np.zeros((S, A, 3), np.float32)
        mask = np.zeros((S, A), bool)
        for i, m in enumerate(mols):
            pos0[i, : m.num_atoms] = m.conformers[0][: m.num_atoms]
            mask[i, : m.num_atoms] = True

        res = batched_lbfgs_flat_minimize(
            mmff_energy_and_grad, jnp.asarray(pos0), jnp.asarray(mask),
            max_iters=200, energy_args=batch,
        )
        conv_repo = np.asarray(res.converged)
        e_repo = np.asarray(res.energies)

        agree = 0
        details = []
        for s in range(S):
            sub = make_batched_mmff([mols[s]], A, MMFFProperties())

            def e_of_flat(x, sub=sub, s=s):
                p = jnp.asarray(x.reshape(1, A, 3), jnp.float32)
                e, g = mmff_energy_and_grad(p, sub)
                g = np.asarray(g, np.float64).ravel()
                g[~np.repeat(mask[s], 3)] = 0.0
                return float(np.asarray(e)[0]), g

            r = scipy_opt.minimize(
                e_of_flat, pos0[s].ravel().astype(np.float64), jac=True,
                method="L-BFGS-B", options={"maxiter": 200},
            )
            scipy_conv = bool(r.success)
            if scipy_conv == bool(conv_repo[s]):
                agree += 1
            else:
                details.append((s, bool(conv_repo[s]), scipy_conv,
                                float(e_repo[s]), float(r.fun)))
        # >= 90% flag agreement (the directive's bar); disagreements are
        # legitimately possible on stragglers near the iteration cap
        assert agree / S >= 0.90, (agree, S, details)
