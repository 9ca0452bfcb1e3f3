"""Multi-chip execution tests on the virtual 8-device CPU mesh
(the reference's multi-GPU tests run with runtime skips on multi-GPU
nodes, SURVEY §4.3; here the mesh is always available)."""
import math

import numpy as np
import pytest

import jax

from nvmolkit_tpu.chem import mol_from_smiles
from nvmolkit_tpu.fingerprints import MorganFingerprintGenerator
from nvmolkit_tpu.similarity import crossTanimotoSimilarity
from nvmolkit_tpu.uffOptimization import UFFOptimizeMoleculesConfs
from nvmolkit_tpu.utils.config import HardwareOptions

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (virtual) devices"
)


@pytest.fixture(scope="module")
def fps(request):
    mols = [mol_from_smiles(s) for s in request.getfixturevalue("smiles100")]
    return MorganFingerprintGenerator(radius=2, fpSize=1024).GetFingerprintsCpu(mols)


def test_distributed_similarity_matches_single(fps):
    opts = HardwareOptions(deviceIds=list(range(8)))
    multi = crossTanimotoSimilarity(fps, hardwareOptions=opts).numpy()
    single = crossTanimotoSimilarity(fps).numpy()
    assert multi.shape == single.shape == (100, 100)
    np.testing.assert_allclose(multi, single, atol=1e-6)


def test_distributed_similarity_unpadded_rows(fps):
    # 37 rows is not a multiple of 8: exercises padding+slice
    opts = HardwareOptions(deviceIds=list(range(8)))
    multi = crossTanimotoSimilarity(fps[:37], fps, hardwareOptions=opts).numpy()
    single = crossTanimotoSimilarity(fps[:37], fps).numpy()
    np.testing.assert_allclose(multi, single, atol=1e-6)


def test_distributed_minimize_matches_single(rng):
    mols_a = [mol_from_smiles(s) for s in ["CCO", "CCC", "CCN"]]
    mols_b = [mol_from_smiles(s) for s in ["CCO", "CCC", "CCN"]]

    def lattice(m):
        n = m.num_atoms
        side = math.ceil(n ** (1 / 3))
        grid = np.array(
            [(x, y, z) for x in range(side) for y in range(side) for z in range(side)],
            float,
        )[:n]
        return grid * 1.6

    for ma, mb in zip(mols_a, mols_b):
        c = lattice(ma)
        ma.add_conformer(c)
        mb.add_conformer(c)

    single, _ = UFFOptimizeMoleculesConfs(mols_a, maxIters=200)
    multi, _ = UFFOptimizeMoleculesConfs(
        mols_b, maxIters=200,
        hardwareOptions=HardwareOptions(deviceIds=list(range(8))),
    )
    for (s_res, m_res) in zip(single, multi):
        for (s_stat, s_e), (m_stat, m_e) in zip(s_res, m_res):
            assert m_e == pytest.approx(s_e, abs=0.05)


def test_bad_device_ids():
    from nvmolkit_tpu.parallel.distributed import resolve_devices

    with pytest.raises(ValueError):
        resolve_devices([99])
