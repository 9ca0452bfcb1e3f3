"""Hardware-option autotuning.

Mirrors the reference's ``nvmolkit/autotune/`` (SURVEY.md §2.14): an
Optuna-backed search over batching/hardware knobs maximizing items/sec,
with adaptive calibration so each trial fits a time budget. Optuna is
optional (as in the reference, ``autotune/__init__.py:16-36``); without
it a deterministic random-search sampler is used.
"""

from nvmolkit_tpu.autotune._core import (
    OPTUNA_AVAILABLE,
    SearchSpace,
    TuneResult,
    run_study,
)
from nvmolkit_tpu.autotune._persistence import load_options, save_options
from nvmolkit_tpu.autotune.wrappers import (
    tune_batched_forcefield,
    tune_cross_similarity,
    tune_embed_molecules,
    tune_mmff_optimize,
    tune_substructure,
    tune_uff_optimize,
)

__all__ = [
    "OPTUNA_AVAILABLE",
    "SearchSpace",
    "TuneResult",
    "run_study",
    "save_options",
    "load_options",
    "tune_batched_forcefield",
    "tune_cross_similarity",
    "tune_embed_molecules",
    "tune_mmff_optimize",
    "tune_substructure",
    "tune_uff_optimize",
]
