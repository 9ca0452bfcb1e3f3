"""float64 validation mode (reference uses f64 positions/energies
throughout, ``src/forcefields/mmff.h:318-341``; the TPU build is f32 on
device). This module runs the optimize stack under
``JAX_ENABLE_X64=1`` on CPU in a subprocess (the flag is global, so it
must not leak into the f32 session) and asserts the f32 results match
the f64 ground truth within documented tolerances:

  final energies   |E32 - E64|  < 1e-1 kcal/mol per system for
                   same-basin results. The dominant f32 error is
                   arccos/arctan conditioning in angle/torsion terms at
                   near-planar aromatic geometries (d acos/dx diverges
                   at |x|=1), worth ~5e-2 on a phenol at an identical
                   geometry — the reference runs f64 end-to-end
                   precisely to avoid this class of error
  geometry         Kabsch-aligned RMSD < 0.3 A for >= 75% of systems
                   (minimization fixes no global frame, and borderline
                   systems may legitimately settle in different minima)
  convergence      >= 75% of systems agree on converged status
"""
import json
import os
import subprocess
import sys
import textwrap
from pathlib import Path

import numpy as np
import pytest

pytestmark = pytest.mark.long  # ~10 min of f64 subprocess recompiles

_SCRIPT = textwrap.dedent(
    """
    import json, sys
    import numpy as np
    import jax
    import jax.numpy as jnp

    from nvmolkit_tpu.chem import mol_from_smiles
    from nvmolkit_tpu.embedMolecules import EmbedMolecules
    from nvmolkit_tpu.models.mmff import MMFFProperties, make_batched_mmff, mmff_energy_and_grad
    from nvmolkit_tpu.ops.lbfgs_flat import batched_lbfgs_flat_minimize

    dtype = jnp.float64 if sys.argv[1] == "f64" else jnp.float32
    mols = [mol_from_smiles(s) for s in ("CCO", "CCCN", "CC(=O)NC", "c1ccccc1O")]
    EmbedMolecules(mols, confsPerMolecule=2, maxIterations=10)
    A = 16
    sys_mols, pos = [], []
    for m in mols:
        for c in m.conformers:
            sys_mols.append(m)
            p = np.zeros((A, 3))
            p[: m.num_atoms] = c
            pos.append(p)
    batch = make_batched_mmff(sys_mols, A, MMFFProperties())
    pos0 = jnp.asarray(np.stack(pos), dtype=dtype)
    res = batched_lbfgs_flat_minimize(
        mmff_energy_and_grad, pos0, batch.atom_mask, max_iters=200,
        energy_args=batch,
    )
    out = {
        "e": np.asarray(res.energies, np.float64).tolist(),
        "pos": np.asarray(res.positions, np.float64).tolist(),
        "conv": np.asarray(res.converged).astype(int).tolist(),
    }
    print("RESULT" + json.dumps(out))
    """
)


def _run(mode: str, x64: bool):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    if x64:
        env["JAX_ENABLE_X64"] = "1"
    env["PYTHONPATH"] = str(Path(__file__).resolve().parents[1]) + os.pathsep + env.get("PYTHONPATH", "")
    r = subprocess.run(
        [sys.executable, "-c", _SCRIPT, mode],
        capture_output=True, text=True, env=env, timeout=900,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    line = [x for x in r.stdout.splitlines() if x.startswith("RESULT")][-1]
    return json.loads(line[len("RESULT"):])


def test_f32_matches_f64_within_tolerance():
    r32 = _run("f32", x64=False)
    r64 = _run("f64", x64=True)
    e32, e64 = np.asarray(r32["e"]), np.asarray(r64["e"])
    p32, p64 = np.asarray(r32["pos"]), np.asarray(r64["pos"])
    assert e32.shape == e64.shape

    # Kabsch-aligned per-system RMSD (global frame is arbitrary)
    def aligned_rmsd(a, b):
        a = a - a.mean(0)
        b = b - b.mean(0)
        h = a.T @ b
        u, _s, vt = np.linalg.svd(h)
        d = np.sign(np.linalg.det(vt.T @ u.T))
        r = vt.T @ np.diag([1.0, 1.0, d]) @ u.T
        return float(np.sqrt(np.mean(np.sum((a @ r.T - b) ** 2, axis=1))))

    rmsds = np.asarray(
        [aligned_rmsd(p32[s], p64[s]) for s in range(p32.shape[0])]
    )
    assert np.mean(rmsds < 0.3) >= 0.75, rmsds
    # the energy contract applies to systems that converged to the SAME
    # basin (rmsd < 0.3); borderline systems may legitimately settle in
    # different minima under f32-vs-f64 embedding round-off
    same_basin = rmsds < 0.3
    assert np.max(np.abs(e32[same_basin] - e64[same_basin])) < 1e-1, (
        e32, e64, rmsds,
    )
    # converged sets agree except borderline systems
    assert np.mean(np.asarray(r32["conv"]) == np.asarray(r64["conv"])) >= 0.75


def test_public_api_x64_mode():
    """NVMOLKIT_X64=1 runs the public optimize API in double precision
    end to end (the reference's f64 contract, mmff.h:334-341)."""
    import json
    import os
    import subprocess
    import sys
    from pathlib import Path

    prog = r"""
import json
import numpy as np
from nvmolkit_tpu.chem import mol_from_smiles
from nvmolkit_tpu.embedMolecules import EmbedMolecules
from nvmolkit_tpu.mmffOptimization import MMFFOptimizeMoleculesConfs
m = mol_from_smiles("CCO")
EmbedMolecules([m], confsPerMolecule=1, maxIterations=10)
results, dense = MMFFOptimizeMoleculesConfs([m], maxIters=150)
print(json.dumps({
    "pos_dtype": str(np.asarray(dense.positions).dtype),
    "e_dtype": str(np.asarray(dense.energies).dtype),
    "converged": results[0][0][0] == 0,
}))
"""
    env = dict(os.environ, NVMOLKIT_X64="1", JAX_PLATFORMS="cpu")
    env.pop("XLA_FLAGS", None)
    proc = subprocess.run(
        [sys.executable, "-c", prog], capture_output=True, text=True,
        timeout=900, env=env, cwd=str(Path(__file__).resolve().parents[1]),
    )
    line = [l for l in proc.stdout.splitlines() if l.startswith("{")][-1]
    got = json.loads(line)
    assert got["pos_dtype"] == "float64", (got, proc.stderr[-500:])
    assert got["e_dtype"] == "float64"
    assert got["converged"]


# ---------------------------------------------------------------------------
# round 4: f64 end-to-end (embed -> optimize -> TFD -> RMSD)
# ---------------------------------------------------------------------------
#
# The reference runs f64 positions/energies through the WHOLE conformer
# pipeline (src/forcefields/mmff.h:334-341). NVMOLKIT_X64=1 now covers
# embed, TFD and conformer RMSD in addition to optimize. Tolerances
# (f32 vs f64 on IDENTICAL conformers — the embed PRNG draws differ by
# dtype, so pipeline comparisons fix the geometry first):
#
#   TFD values       |d| < 1e-5   (torsion angles are arctan2 of
#                    well-conditioned cross/dot products; f32 error is
#                    ~1e-6 rad on drug-like torsions)
#   RMSD values      |d| < 2e-3 A. RMSD is a sqrt of differences of
#                    near-equal covariance terms; for near-identical
#                    conformers (true RMSD ~1e-3 A) the f32 Kabsch
#                    path cancels catastrophically and the ABSOLUTE
#                    noise floor is ~1e-3 A — measured on embedded
#                    n-butanol conformers, f32 reported 0.0 where f64
#                    gave 5.6e-4. Distinguishing conformers that close
#                    requires the f64 mode; that is exactly why the
#                    reference runs f64 end-to-end.

_E2E_SCRIPT = textwrap.dedent(
    """
    import json, sys
    import numpy as np
    import nvmolkit_tpu  # must import first so NVMOLKIT_X64 applies
    import jax.numpy as jnp
    from nvmolkit_tpu.chem import mol_from_smiles
    from nvmolkit_tpu.embedMolecules import EmbedMolecules
    from nvmolkit_tpu.mmffOptimization import MMFFOptimizeMoleculesConfs
    from nvmolkit_tpu.tfd import GetTFDMatrix
    from nvmolkit_tpu.conformerRmsd import GetConformerRMSMatrix

    mols = [mol_from_smiles(s) for s in
            ("CCCCO", "CC(=O)NCC", "c1ccccc1CCO", "CCOC(=O)CC")]
    res = EmbedMolecules(mols, confsPerMolecule=4, maxIterations=10)
    assert str(np.asarray(res.positions).dtype) == sys.argv[1], (
        np.asarray(res.positions).dtype)
    e, conv = MMFFOptimizeMoleculesConfs(mols, maxIters=100)
    out = {"dtype": str(np.asarray(res.positions).dtype)}
    out["tfd"] = [
        np.asarray(GetTFDMatrix(m).numpy(), np.float64).tolist() for m in mols
    ]
    out["rms"] = [
        np.asarray(GetConformerRMSMatrix(m).numpy(), np.float64).tolist()
        for m in mols
    ]
    out["confs"] = [
        np.asarray(np.stack(m.conformers), np.float64).tolist() for m in mols
    ]
    print("RESULT" + json.dumps(out))
    """
)


def _run_e2e(x64: bool):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("JAX_ENABLE_X64", None)
    if x64:
        env["NVMOLKIT_X64"] = "1"
    else:
        env.pop("NVMOLKIT_X64", None)
    env["PYTHONPATH"] = (
        str(Path(__file__).resolve().parents[1]) + os.pathsep
        + env.get("PYTHONPATH", "")
    )
    r = subprocess.run(
        [sys.executable, "-c", _E2E_SCRIPT, "float64" if x64 else "float32"],
        capture_output=True, text=True, env=env, timeout=900,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    line = [x for x in r.stdout.splitlines() if x.startswith("RESULT")][-1]
    return json.loads(line[len("RESULT"):])


def test_x64_pipeline_end_to_end():
    """NVMOLKIT_X64=1 carries f64 through embed -> optimize -> TFD ->
    RMSD (dtype asserted inside the subprocess)."""
    out = _run_e2e(x64=True)
    assert out["dtype"] == "float64"
    # values are finite and in range
    for row in out["tfd"]:
        assert all(0.0 <= v <= 1.0 for v in row), row
    for row in out["rms"]:
        assert all(v >= 0.0 for v in row), row


# module-level cache: the e2e subprocesses take ~1 min each; run once
_E2E_CACHE: dict = {}


def _e2e(x64: bool):
    if x64 not in _E2E_CACHE:
        _E2E_CACHE[x64] = _run_e2e(x64)
    return _E2E_CACHE[x64]


def test_tfd_rmsd_f32_vs_f64_on_same_conformers():
    """TFD / RMSD tolerance rows: compute both precisions on the SAME
    f64-embedded conformers (cast down for the f32 pass)."""
    out64 = _e2e(x64=True)

    # recompute TFD + RMSD in this (f32) process on the f64 conformers
    from nvmolkit_tpu.chem import mol_from_smiles
    from nvmolkit_tpu.conformerRmsd import GetConformerRMSMatrix
    from nvmolkit_tpu.tfd import GetTFDMatrix

    smiles = ("CCCCO", "CC(=O)NCC", "c1ccccc1CCO", "CCOC(=O)CC")
    for mi, smi in enumerate(smiles):
        m = mol_from_smiles(smi)
        for conf in out64["confs"][mi]:
            m.conformers.append(np.asarray(conf, np.float32))
        tfd32 = np.asarray(GetTFDMatrix(m).numpy(), np.float64)
        tfd64 = np.asarray(out64["tfd"][mi], np.float64)
        assert tfd32.shape == tfd64.shape
        if tfd32.size:
            assert np.max(np.abs(tfd32 - tfd64)) < 1e-5, (smi, tfd32, tfd64)
        rms32 = np.asarray(GetConformerRMSMatrix(m).numpy(), np.float64)
        rms64 = np.asarray(out64["rms"][mi], np.float64)
        assert np.max(np.abs(rms32 - rms64)) < 2e-3, (smi, rms32, rms64)
