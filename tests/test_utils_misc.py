"""Tests: config, profiling, testutils, mesh helpers."""
import numpy as np
import pytest

from nvmolkit_tpu.utils.config import HardwareOptions
from nvmolkit_tpu.utils.hashing import hash_combine_u32
from nvmolkit_tpu.utils.profiling import StageTimer, trace_scope
from nvmolkit_tpu.testutils import (
    check_bounds_satisfied,
    check_chirality_preserved,
    load_n_molecules,
)


def test_hardware_options_roundtrip():
    ho = HardwareOptions(batchSize=128, deviceIds=[0, 1], atomBuckets=(32, 64))
    back = HardwareOptions.from_json(ho.to_json())
    assert back == ho
    with pytest.raises(ValueError):
        HardwareOptions.from_dict({"nope": 1})
    with pytest.raises(ValueError):
        HardwareOptions(batchSize=0)
    with pytest.raises(ValueError):
        HardwareOptions(atomBuckets=(64, 32))


def test_hash_combine_matches_boost_reference():
    # boost hash_combine(0, 0x9e3779b9-style golden) fixed values
    import numpy as np

    a = hash_combine_u32(np.uint32(0), np.uint32(1))
    b = hash_combine_u32(np.uint32(0), np.uint32(1))
    assert a == b
    assert a != hash_combine_u32(np.uint32(1), np.uint32(1))
    # wrap-around under large inputs
    big = hash_combine_u32(np.uint32(0xFFFFFFFF), np.uint32(0xFFFFFFFF))
    assert 0 <= int(big) <= 0xFFFFFFFF


def test_stage_timer_report():
    t = StageTimer()
    with t.stage("alpha"):
        pass
    with t.stage("alpha"):
        pass
    with t.stage("beta"):
        pass
    rep = t.report()
    assert "alpha" in rep and "beta" in rep
    assert t.stats["alpha"].count == 2


def test_trace_scope_noop():
    with trace_scope("outer"):
        x = 1 + 1
    assert x == 2


def test_load_n_molecules():
    mols = load_n_molecules(20, max_atoms=24)
    assert len(mols) == 20
    assert all(m.num_atoms <= 24 for m in mols)


def test_conformer_checkers():
    from nvmolkit_tpu.chem import mol_from_smiles
    from nvmolkit_tpu.embedMolecules import EmbedMolecules

    m = mol_from_smiles("C[C@H](N)C(=O)O")
    EmbedMolecules([m], confsPerMolecule=1, maxIterations=15)
    assert m.conformers
    pos = m.conformers[0]
    assert check_bounds_satisfied(m, pos)
    assert check_chirality_preserved(m, pos)
    # garbage coordinates fail the bounds check
    assert not check_bounds_satisfied(m, pos * 3.0)
    # mirrored coordinates flip chirality
    flipped = pos.copy()
    flipped[:, 2] *= -1
    assert not check_chirality_preserved(m, flipped)


def test_embed_debug_mode(capsys):
    from nvmolkit_tpu.chem import mol_from_smiles
    from nvmolkit_tpu.embedMolecules import EmbedMolecules

    m = mol_from_smiles("CCO")
    EmbedMolecules([m], confsPerMolecule=1, maxIterations=5, debugMode=True)
    out = capsys.readouterr().out
    assert "first_minimization" in out
    assert "stereo_checks" in out


def test_hardware_options_reference_spellings():
    """Reference kwarg spellings (nvmolkit/types.py:39-90) construct and
    read back; canonical fields win when both are given."""
    from nvmolkit_tpu.utils.config import HardwareOptions

    o = HardwareOptions(batchSize=200, batchesPerGpu=4, gpuIds=[1, 2])
    assert o.batchesPerDevice == 4 and o.batchesPerGpu == 4
    assert o.deviceIds == [1, 2] and o.gpuIds == [1, 2]
    o2 = HardwareOptions(batchesPerDevice=8, batchesPerGpu=4)
    assert o2.batchesPerDevice == 8
    o3 = HardwareOptions.from_dict({"batchesPerGpu": 3, "gpuIds": [0]})
    assert o3.batchesPerDevice == 3 and o3.deviceIds == [0]
    # round trip stays canonical
    o4 = HardwareOptions.from_json(o.to_json())
    assert o4.batchesPerDevice == 4 and o4.deviceIds == [1, 2]


def test_tfd_return_type_formats():
    import numpy as np

    from nvmolkit_tpu.chem import mol_from_smiles
    from nvmolkit_tpu.embedMolecules import EmbedMolecules
    from nvmolkit_tpu.tfd import GetTFDMatrix

    m = mol_from_smiles("CCCCO")
    EmbedMolecules([m], confsPerMolecule=3, maxIterations=10)
    as_list = GetTFDMatrix(m, return_type="list")
    as_np = GetTFDMatrix(m, return_type="numpy")
    as_t = GetTFDMatrix(m, return_type="tensor")
    assert isinstance(as_list, list)
    assert isinstance(as_np, np.ndarray)
    assert type(as_t).__module__.startswith("torch")
    assert np.allclose(as_list, as_np) and np.allclose(as_np, np.asarray(as_t))
    import pytest

    with pytest.raises(ValueError):
        GetTFDMatrix(m, return_type="bogus")
