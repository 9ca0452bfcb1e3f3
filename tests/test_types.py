"""Result-type tests (reference ``test_types.py`` role: Device3DResult
dense/per_molecule/CSR round-trips)."""
import numpy as np

import jax.numpy as jnp

from nvmolkit_tpu.types import Dense3DResult, Device3DResult


def _result():
    pos = np.arange(2 * 3 * 4 * 3, dtype=np.float32).reshape(2, 3, 4, 3)
    conf_mask = np.array([[True, True, False], [True, False, False]])
    atom_mask = np.array([[True, True, True, False], [True, True, False, False]])
    return Dense3DResult(
        positions=jnp.asarray(pos),
        conf_mask=jnp.asarray(conf_mask),
        atom_mask=jnp.asarray(atom_mask),
    )


def test_alias():
    assert Device3DResult is Dense3DResult


def test_per_molecule():
    r = _result()
    pm = r.per_molecule()
    assert len(pm) == 2
    assert len(pm[0]) == 2 and len(pm[1]) == 1
    assert pm[0][0].shape == (3, 3)
    assert pm[1][0].shape == (2, 3)


def test_dense_pads():
    r = _result()
    pos, cmask, amask = r.dense(pad_value=-1.0)
    assert (pos[0, 2] == -1.0).all()       # masked conformer
    assert (pos[0, 0, 3] == -1.0).all()    # masked atom
    assert (pos[0, 0, 0] != -1.0).any()


def test_csr_roundtrip():
    r = _result()
    csr = r.csr()
    assert csr["positions"].shape == (3 + 3 + 2, 3)
    np.testing.assert_array_equal(csr["atom_starts"], [0, 3, 6, 8])
    np.testing.assert_array_equal(csr["mol_indices"], [0, 0, 1])
    np.testing.assert_array_equal(csr["conf_indices"], [0, 1, 0])
    # flat rows equal the dense rows
    np.testing.assert_array_equal(
        csr["positions"][:3], np.asarray(r.positions)[0, 0, :3]
    )


def test_async_result_torch_and_device():
    import jax.numpy as jnp
    import numpy as np

    from nvmolkit_tpu.types import AsyncResult

    r = AsyncResult(jnp.arange(6, dtype=jnp.float32).reshape(2, 3))
    assert r.device is not None
    t = r.torch()
    assert t.shape == (2, 3)
    np.testing.assert_array_equal(t.numpy(), r.numpy())
    host = AsyncResult(np.ones((2, 2), np.float32))
    assert host.device is None
    assert host.torch().shape == (2, 2)


class TestReferenceKwargParity:
    """Round-3: output/targetGpu on embed, structured errors on optimize
    (reference contracts: nvmolkit/embedMolecules.py:41-53,
    nvmolkit/mmffOptimization.py:101-111, uffOptimization.py:86-87)."""

    def test_embed_device_output_skips_writeback(self):
        from nvmolkit_tpu.chem import mol_from_smiles
        from nvmolkit_tpu.embedMolecules import EmbedMolecules
        from nvmolkit_tpu.types import CoordinateOutput

        mols = [mol_from_smiles("CCO"), mol_from_smiles("CCC")]
        res = EmbedMolecules(
            mols, confsPerMolecule=2, maxIterations=10,
            output=CoordinateOutput.DEVICE,
        )
        assert int(np.asarray(res.conf_mask).sum()) >= 2
        assert all(len(m.conformers) == 0 for m in mols)
        # default output still writes back
        EmbedMolecules(mols, confsPerMolecule=1, maxIterations=10)
        assert all(len(m.conformers) >= 1 for m in mols)

    def test_embed_target_gpu(self):
        from nvmolkit_tpu.chem import mol_from_smiles
        from nvmolkit_tpu.embedMolecules import EmbedMolecules

        m = mol_from_smiles("CCO")
        res = EmbedMolecules([m], confsPerMolecule=1, maxIterations=10,
                             targetGpu=0)
        assert int(np.asarray(res.conf_mask).sum()) == 1

    def test_mmff_structured_value_error(self):
        import pytest

        from nvmolkit_tpu.chem import mol_from_smiles
        from nvmolkit_tpu.mmffOptimization import MMFFOptimizeMoleculesConfs

        m = mol_from_smiles("CCO")
        with pytest.raises(ValueError) as ei:
            MMFFOptimizeMoleculesConfs([m, None, None])
        assert ei.value.args[1] == {"none": [1, 2], "no_params": []}

    def test_uff_structured_value_error_and_empty(self):
        import pytest

        from nvmolkit_tpu.types import CoordinateOutput
        from nvmolkit_tpu.uffOptimization import UFFOptimizeMoleculesConfs

        with pytest.raises(ValueError) as ei:
            UFFOptimizeMoleculesConfs([None])
        assert ei.value.args[1]["none"] == [0]
        assert UFFOptimizeMoleculesConfs([]) == ([], None)
        with pytest.raises(ValueError):
            UFFOptimizeMoleculesConfs([], output=CoordinateOutput.DEVICE)


class TestStreamKwargParity:
    """The reference's public APIs take ``stream=`` (a torch.cuda.Stream,
    e.g. ``nvmolkit/clustering.py:46``); here the kwarg is accepted for
    drop-in source compatibility and must be None (XLA async dispatch
    replaces CUDA streams)."""

    def test_stream_none_accepted_everywhere(self):
        import numpy as np

        from nvmolkit_tpu.chem import mol_from_smiles
        from nvmolkit_tpu.clustering import butina, fused_butina
        from nvmolkit_tpu.conformerRmsd import GetConformerRMSMatrixBatch
        from nvmolkit_tpu.embedMolecules import EmbedMolecules
        from nvmolkit_tpu.fingerprints import MorganFingerprintGenerator
        from nvmolkit_tpu.similarity import (
            crossCosineSimilarity,
            crossTanimotoSimilarity,
        )

        mols = [mol_from_smiles(s) for s in ("CCO", "CCC")]
        gen = MorganFingerprintGenerator(radius=2, fpSize=512)
        fps = gen.GetFingerprints(mols, stream=None)
        assert crossTanimotoSimilarity(fps, stream=None).shape == (2, 2)
        assert crossCosineSimilarity(fps, stream=None).shape == (2, 2)
        d = 1.0 - np.asarray(crossTanimotoSimilarity(fps).numpy())
        assert butina(d, cutoff=0.5, stream=None).shape == (2,)
        clusters, _ = fused_butina(fps, cutoff=0.5, stream=None)
        assert sum(len(c) for c in clusters) == 2

        EmbedMolecules(mols, confsPerMolecule=2, maxIterations=5)
        GetConformerRMSMatrixBatch(mols, stream=None)

    def test_stream_non_none_rejected(self):
        import numpy as np
        import pytest

        from nvmolkit_tpu.clustering import butina
        from nvmolkit_tpu.similarity import crossTanimotoSimilarity

        fps = np.zeros((2, 16), np.uint32)
        with pytest.raises(TypeError, match="stream"):
            crossTanimotoSimilarity(fps, stream=object())
        with pytest.raises(TypeError, match="stream"):
            butina(np.zeros((2, 2), np.float32), cutoff=0.5, stream=object())
