"""Test configuration: run all tests on a virtual 8-device CPU mesh.

Mirrors the reference's test strategy (SURVEY.md §4): no physical
accelerator required; multi-chip sharding logic is exercised on virtual
CPU devices. Real-TPU numbers come from bench.py, not tests.
"""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# Some TPU plugins (e.g. the axon tunnel) ignore JAX_PLATFORMS; the config
# update below is honored even then.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="module", autouse=True)
def _clear_jax_caches_between_modules():
    """Release compiled XLA executables after each test module.

    Every XLA:CPU executable holds multiple memory mappings for its
    JIT'd code. The full suite compiles thousands of programs in one
    process; without clearing, the process crosses the kernel's
    vm.max_map_count limit (65530) around 90% through the suite and
    XLA's code loader segfaults mid-compile (observed: >56k mappings at
    the halfway mark). Clearing per module keeps the map count bounded;
    the on-disk persistent compilation cache keeps recompiles cheap for
    programs shared across modules."""
    yield
    jax.clear_caches()


@pytest.fixture(scope="session")
def smiles100():
    """100 drug-like SMILES covering rings, aromatics, charges, stereo.

    Serves the role of the reference's ``testdata/smiles.csv`` fixture
    (``nvmolkit/tests/conftest.py:23-58``).
    """
    from tests.data.smiles import SMILES_100

    return SMILES_100


@pytest.fixture(scope="session")
def mols100(smiles100):
    from nvmolkit_tpu.chem import mol_from_smiles

    return [mol_from_smiles(s) for s in smiles100]


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0xC0FFEE)
