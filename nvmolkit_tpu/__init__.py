"""nvmolkit_tpu: a TPU-native batch cheminformatics acceleration framework.

A from-scratch JAX/XLA/Pallas rebuild of the capability surface of
NVIDIA-Digital-Bio/nvMolKit (reference: ``nvmolkit/__init__.py:16-31``):
batch Morgan fingerprints, packed-bitvector cross similarity, Butina
clustering, batched MMFF94/UFF/DG/ETK force fields with BFGS minimization,
ETKDG conformer embedding, TFD and conformer-RMSD matrices, substructure
search, and hardware autotuning — all designed TPU-first:

  * compute kernels are jitted XLA programs / Pallas TPU kernels over
    bucketed, padded, masked batches (no ragged CSR on device),
  * similarity rides the MXU as a bits->bf16/int8 matmul instead of the
    reference's b1 tensor-core BMMA path,
  * device-side control loops (Butina, BFGS, ETKDG retries) are
    ``lax.while_loop`` + active masks instead of CUDA-graph conditionals,
  * multi-chip scaling is a ``jax.sharding.Mesh`` + ``pjit``/``shard_map``
    data-parallel sweep over molecules (the reference's only cross-device
    op is result gathering — see SURVEY.md §2.16).

Unlike the reference, this package does not require RDKit: it ships its
own lightweight cheminformatics core (``nvmolkit_tpu.chem``) for SMILES
parsing, ring perception, and force-field parametrization, with an
optional RDKit adapter when RDKit is importable.
"""

__version__ = "0.1.0"

import os as _os

import jax as _jax

# Persistent XLA compilation cache: the batch pipelines compile one
# program per (bucket, term-count) shape; caching makes repeat runs
# start in milliseconds instead of minutes. Opt out by setting
# NVMOLKIT_TPU_NO_CACHE=1 or pointing JAX_COMPILATION_CACHE_DIR elsewhere.
if not _os.environ.get("NVMOLKIT_TPU_NO_CACHE"):
    _cache_dir = _os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        _os.path.join(_os.path.expanduser("~"), ".cache", "nvmolkit_tpu_xla"),
    )
    try:
        _jax.config.update("jax_compilation_cache_dir", _cache_dir)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # older jax without these options
        pass

# f32 matmuls must be f32-accurate. XLA:TPU's default matmul precision
# runs float32 dots as SINGLE bf16 MXU passes, which silently rounds
# both operands to 8 mantissa bits: measured on v5e, the one-hot
# uint16-payload selections (Morgan hash halves) return ~98% wrong
# values at MXU-engaged shapes, and position Gram matrices (nonbonded
# distances, DG bounds, RMSD) pick up 5e-2-scale absolute errors. The
# CPU backend computes real f32, so the CPU-mesh test suite cannot see
# this — it surfaced as device-vs-oracle fingerprint mismatches on the
# real chip. HIGHEST decomposes f32 dots into multiple bf16 passes
# (f32-equivalent); integer/int8 paths (similarity) are unaffected.
# NVMOLKIT_FAST_MATMUL=1 restores the fast-and-loose default.
if _os.environ.get("NVMOLKIT_FAST_MATMUL") != "1":
    _jax.config.update("jax_default_matmul_precision", "highest")

# Double-precision mode: the reference runs f64 positions/energies
# throughout (``src/forcefields/mmff.h:334-341``); the TPU-first default
# here is f32 (documented same-basin tolerance 1e-1 kcal/mol, see
# tests/test_f64_validation.py's tolerance table). NVMOLKIT_X64=1 flips
# the whole package to f64 — positions entering the pipelines keep their
# dtype, so conformers (stored f64) run in full double precision. Must
# be set before import; XLA emulates f64 on TPU at a throughput cost.
if _os.environ.get("NVMOLKIT_X64") == "1":
    _jax.config.update("jax_enable_x64", True)

from nvmolkit_tpu import chem, ops, parallel, utils  # noqa: F401

__all__ = ["chem", "ops", "parallel", "utils", "__version__"]
