"""Autotune tests (reference ``test_autotune.py`` role: optuna-absence
handling, search-space validation, persistence round-trips)."""
import numpy as np
import pytest

from nvmolkit_tpu.autotune import (
    OPTUNA_AVAILABLE,
    run_study,
    save_options,
    load_options,
    tune_cross_similarity,
)
from nvmolkit_tpu.autotune._calibration import auto_subsample
from nvmolkit_tpu.substructure import SubstructSearchConfig
from nvmolkit_tpu.utils.config import HardwareOptions


def test_run_study_finds_better_config():
    # objective: peak at x=7, categorical bonus for 'b'
    def objective(p):
        return 100.0 - (p["x"] - 7) ** 2 + (10.0 if p["c"] == "b" else 0.0)

    res = run_study(objective, {"x": (0, 20), "c": ["a", "b"]}, n_trials=40, seed=1)
    assert res.best_value >= 100.0
    assert abs(res.best_params["x"] - 7) <= 2
    assert len(res.trials) == 40
    assert res.sampler in ("optuna-tpe", "random")


def test_failed_trials_score_zero():
    def objective(p):
        if p["x"] < 5:
            raise RuntimeError("boom")
        return float(p["x"])

    res = run_study(objective, {"x": (0, 10)}, n_trials=20, seed=2)
    assert res.best_value >= 5.0
    assert all(v == 0.0 for p, v in res.trials if p["x"] < 5)


def test_search_space_validation():
    with pytest.raises(ValueError):
        run_study(lambda p: 0.0, {"x": (1.5, 2.5)}, n_trials=1)
    with pytest.raises(ValueError):
        run_study(lambda p: 0.0, {"x": []}, n_trials=1)
    with pytest.raises(ValueError):
        run_study(lambda p: 0.0, {"x": "bad"}, n_trials=1)


def test_log_range():
    seen = []

    def objective(p):
        seen.append(p["n"])
        return 1.0

    run_study(objective, {"n": (16, 4096, "log")}, n_trials=30, seed=3)
    assert min(seen) >= 16 and max(seen) <= 4096
    assert min(seen) < 256  # log sampling reaches the low decade


def test_optuna_flag_is_bool():
    assert isinstance(OPTUNA_AVAILABLE, bool)


def test_persistence_roundtrip(tmp_path):
    ho = HardwareOptions(batchSize=256, atomBuckets=(64, 256))
    p = tmp_path / "opts.json"
    save_options(p, ho)
    back = load_options(p)
    assert back == ho

    cfg = SubstructSearchConfig(maxMatches=77)
    p2 = tmp_path / "cfg.json"
    save_options(p2, cfg)
    back2 = load_options(p2)
    assert back2.maxMatches == 77


def test_persistence_rejects_unknown(tmp_path):
    p = tmp_path / "x.json"
    p.write_text('{"kind": "HardwareOptions", "options": {"bogus": 1}}')
    with pytest.raises(ValueError):
        load_options(p)
    p.write_text('{"kind": "Nope", "options": {}}')
    with pytest.raises(ValueError):
        load_options(p)


def test_auto_subsample_shrinks():
    calls = []

    def run(subset):
        calls.append(len(subset))
        return len(subset) / 100.0  # pretend: 100 items/sec

    items = list(range(10000))
    subset = auto_subsample(run, items, per_trial_budget_s=1.0, min_items=8)
    assert len(subset) <= 150
    assert len(subset) >= 8


def test_tune_cross_similarity_smoke(rng):
    from nvmolkit_tpu.ops.packed_bits import pack_bits_np

    fps = pack_bits_np((rng.random((64, 512)) < 0.1).astype(np.uint8))
    res = tune_cross_similarity(fps, n_trials=2)
    assert res.best_value > 0
    assert res.best_params["dtype"] in ("int8", "bfloat16")


def test_persistence_substruct_enum_roundtrip(tmp_path):
    from nvmolkit_tpu.substructure import SubstructAlgorithm

    cfg = SubstructSearchConfig(algorithm=SubstructAlgorithm.VF2)
    p = tmp_path / "alg.json"
    save_options(p, cfg)
    back = load_options(p)
    assert back.algorithm == SubstructAlgorithm.VF2


def test_all_five_workload_wrappers_smoke():
    """Every reference tune_* wrapper has a counterpart that runs and
    returns a usable best_params (persistence round-trip included)."""
    import tempfile
    from pathlib import Path


    from nvmolkit_tpu.autotune import (
        save_options,
        load_options,
        tune_batched_forcefield,
        tune_embed_molecules,
        tune_mmff_optimize,
        tune_substructure,
    )
    from nvmolkit_tpu.chem import mol_from_smiles
    from nvmolkit_tpu.embedMolecules import EmbedMolecules

    mols = [mol_from_smiles(s) for s in ("CCO", "CCCN")]
    EmbedMolecules(mols, confsPerMolecule=2, maxIterations=10)

    r_mmff = tune_mmff_optimize(mols, n_trials=2, max_iters=20)
    assert "atomBuckets" in r_mmff.best_params and "backend" in r_mmff.best_params

    r_bff = tune_batched_forcefield(mols, n_trials=2, max_iters=20)
    assert "atomBuckets" in r_bff.best_params

    r_embed = tune_embed_molecules(mols, n_trials=2, confs_per_molecule=1,
                                   max_iterations=3)
    assert "atomBuckets" in r_embed.best_params
    # tuning must not clobber the caller's conformers
    assert all(len(m.conformers) == 2 for m in mols)

    r_sub = tune_substructure(mols, ["[OX2H1]", "C"], n_trials=2)
    assert "workerThreads" in r_sub.best_params

    with tempfile.TemporaryDirectory() as d:
        from nvmolkit_tpu.utils.config import HardwareOptions

        path = Path(d) / "opts.json"
        tuned = HardwareOptions(atomBuckets=r_mmff.best_params["atomBuckets"])
        save_options(path, tuned)
        loaded = load_options(path)
        assert tuple(loaded.atomBuckets) == tuple(tuned.atomBuckets)
