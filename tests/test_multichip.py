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
def eight_device_opts():
    return HardwareOptions(deviceIds=list(range(8)))


@pytest.fixture(scope="module")
def small_mols():
    return [mol_from_smiles(s) for s in ("CCO", "c1ccccc1", "CC(=O)O", "CCN")]


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


def test_fingerprints_device_ids(eight_device_opts, small_mols):
    from nvmolkit_tpu.fingerprints import MorganFingerprintGenerator

    gen = MorganFingerprintGenerator(radius=2, fpSize=512)
    single = gen.GetFingerprints(small_mols).numpy()
    multi = gen.GetFingerprints(small_mols, hardwareOptions=eight_device_opts).numpy()
    assert (single == multi).all()


def test_fingerprints_from_smiles_device_ids(eight_device_opts):
    from nvmolkit_tpu.fingerprints import MorganFingerprintGenerator

    smiles = ["CCO", "c1ccccc1", "CC(=O)O", "CCN", "CCCC", "c1ccncc1",
              "CC(C)O", "CS(=O)(=O)N", "OCC(O)CO", "CC#N"]
    gen = MorganFingerprintGenerator(radius=2, fpSize=512)
    single = gen.GetFingerprintsFromSmiles(smiles).numpy()
    multi = gen.GetFingerprintsFromSmiles(
        smiles, hardwareOptions=eight_device_opts
    ).numpy()
    assert (single == multi).all()


def test_embed_device_ids(eight_device_opts):
    from nvmolkit_tpu.chem import mol_from_smiles
    from nvmolkit_tpu.embedMolecules import EmbedMolecules
    import numpy as np

    mols = [mol_from_smiles(s) for s in ("CCO", "CCC", "CCN")]
    res = EmbedMolecules(
        mols, confsPerMolecule=3, maxIterations=10,
        hardwareOptions=eight_device_opts,
    )
    assert int(np.asarray(res.conf_mask).sum()) >= 6
    for m in mols:
        assert m.conformers


def test_tfd_device_ids(eight_device_opts):
    from nvmolkit_tpu.chem import mol_from_smiles
    from nvmolkit_tpu.embedMolecules import EmbedMolecules
    from nvmolkit_tpu.tfd import GetTFDMatrices
    import numpy as np

    mols = [mol_from_smiles(s) for s in ("CCCCO", "CCCCN", "CCCCC")]
    EmbedMolecules(mols, confsPerMolecule=3, maxIterations=10)
    single = GetTFDMatrices(mols)
    multi = GetTFDMatrices(mols, hardwareOptions=eight_device_opts)
    for a, b in zip(single, multi):
        np.testing.assert_allclose(a.numpy(), b.numpy(), atol=1e-5)


class TestMultihost:
    """Single-process semantics of the multi-host helpers (a real DCN
    pod run exercises the same code paths with process_count > 1)."""

    def test_initialize_single_host_noop(self):
        from nvmolkit_tpu.parallel import multihost

        assert multihost.initialize() is False  # not distributed
        assert multihost.initialize() is False  # idempotent

    def test_local_rows_partition(self):
        from nvmolkit_tpu.parallel import multihost

        start, end = multihost.local_rows(37)
        assert (start, end) == (0, 37)  # single process owns everything

    def test_local_rows_blocking_math(self):
        # the blocking rule itself, independent of jax.process_*
        def rows(p, n_proc, n_total):
            base, extra = divmod(n_total, n_proc)
            start = p * base + min(p, extra)
            return start, start + base + (1 if p < extra else 0)

        for n_proc in (1, 2, 3, 4, 8):
            for n_total in (0, 1, 7, 8, 37, 64):
                spans = [rows(p, n_proc, n_total) for p in range(n_proc)]
                # contiguous, complete, balanced within 1
                assert spans[0][0] == 0 and spans[-1][1] == n_total
                for (a, b), (c, d) in zip(spans, spans[1:]):
                    assert b == c
                sizes = [b - a for a, b in spans]
                assert max(sizes) - min(sizes) <= 1

    def test_global_array_round_trip(self):
        from nvmolkit_tpu.parallel import multihost

        mesh = multihost.global_mesh()
        x = np.arange(64 * 3, dtype=np.float32).reshape(64, 3)
        g = multihost.global_array(x, 64, mesh)
        assert g.shape == (64, 3)
        np.testing.assert_array_equal(multihost.all_gather_rows(g), x)


class TestMultiDeviceSubstructure:
    """Device substructure engine fanned over deviceIds (round 3):
    join waves round-robin across the mesh; results must equal the
    single-device engine and the native engine exactly."""

    def test_multi_device_equals_single(self):
        from nvmolkit_tpu.chem.native import mols_from_smiles
        from nvmolkit_tpu.substructure import (
            SubstructLibrary,
            SubstructSearchConfig,
            getSubstructMatches,
        )

        targets = mols_from_smiles(
            ["CC(=O)Nc1ccc(O)cc1", "c1ccccc1O", "CCOC(=O)C",
             "CCN(CC)CC", "c1ccc2[nH]ccc2c1", "OCC(O)CO"] * 3
        )
        queries = ["C(=O)N", "c1ccccc1", "[OX2]", "[NX3]"]
        multi = getSubstructMatches(
            SubstructLibrary(targets), queries,
            SubstructSearchConfig(
                useDeviceEngine=True, deviceIds=list(range(8))
            ),
        )
        single = getSubstructMatches(
            SubstructLibrary(targets), queries,
            SubstructSearchConfig(useDeviceEngine=True, deviceIds=[0]),
        )
        native = getSubstructMatches(
            SubstructLibrary(targets), queries,
            SubstructSearchConfig(useDeviceEngine=False),
        )
        import numpy as np

        assert np.array_equal(multi.counts(), single.counts())
        assert np.array_equal(multi.counts(), native.counts())
        for ti in range(len(targets)):
            for qi in range(len(queries)):
                assert sorted(multi.matches(ti, qi)) == sorted(
                    native.matches(ti, qi)
                ), (ti, qi)

    def test_multi_device_counts_only(self):
        import numpy as np

        from nvmolkit_tpu.chem.native import mols_from_smiles
        from nvmolkit_tpu.substructure import (
            SubstructSearchConfig,
            countSubstructMatches,
        )

        targets = mols_from_smiles(["CC(=O)NC", "c1ccccc1C(=O)O"] * 8)
        queries = ["C(=O)", "[OX2H1]"]
        cm = countSubstructMatches(
            targets, queries,
            SubstructSearchConfig(
                useDeviceEngine=True, deviceIds=list(range(8))
            ),
        )
        cn = countSubstructMatches(
            targets, queries, SubstructSearchConfig(useDeviceEngine=False)
        )
        assert np.array_equal(cm, cn)
