#!/usr/bin/env python
"""Snapshot this implementation's outputs as regression goldens
(tests/golden/regression_*.json). NOT external validation — guards
refactors. Regenerate deliberately when behavior changes on purpose."""
import json
import os
import sys
from pathlib import Path

# goldens are consumed by the CPU-mesh test suite; pin the backend so
# the snapshots are platform-deterministic
os.environ["JAX_PLATFORMS"] = "cpu"


REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

from nvmolkit_tpu.chem import mol_from_smiles  # noqa: E402
from tests.data.smiles import SMILES_100  # noqa: E402

out = REPO / "tests" / "golden"
out.mkdir(exist_ok=True)

from nvmolkit_tpu.ops.morgan_cpu import morgan_fingerprint_cpu  # noqa: E402
from nvmolkit_tpu.ops.packed_bits import unpack_bits_np  # noqa: E402

bits = []
for smi in SMILES_100:
    fp = unpack_bits_np(morgan_fingerprint_cpu(mol_from_smiles(smi), 2, 1024)[None])[0]
    bits.append(sorted(np.nonzero(fp)[0].tolist()))
(out / "regression_morgan.json").write_text(
    json.dumps({"smiles": SMILES_100, "bits": bits})
)

from nvmolkit_tpu.substructure import SubstructSearchConfig, getSubstructMatches  # noqa: E402

SMARTS = ["c1ccccc1", "[OX2H1]", "O=C", "[R2]", "[NX3;!$(NC=O)]", "[r5]"]
mols = [mol_from_smiles(s) for s in SMILES_100]
res = getSubstructMatches(mols, SMARTS, SubstructSearchConfig(uniquify=True))
(out / "regression_substruct.json").write_text(
    json.dumps(
        {"smiles": SMILES_100, "smarts": SMARTS, "counts": res.counts().tolist()}
    )
)
print("regression goldens written")

# --- force-field initial energies (parametrization snapshot) --------------
# A deterministic synthetic conformer per molecule (NOT embedded — embed
# numerics may change legitimately); energies snapshot typing + term
# building + the energy kernels.
from nvmolkit_tpu.batchedForcefield import (  # noqa: E402
    MMFFBatchedForcefield,
    UFFBatchedForcefield,
)

rng = np.random.default_rng(12345)
ff_mols = []
for smi in SMILES_100[:40]:
    m = mol_from_smiles(smi)
    if m.num_atoms > 32:
        continue
    m.conformers = [
        (rng.standard_normal((m.num_atoms, 3)) * 1.7).astype(np.float32)
    ]
    ff_mols.append((smi, m))

uff_e = np.asarray(
    UFFBatchedForcefield([m for _, m in ff_mols]).compute_energy().numpy(),
    np.float64,
)
mmff_e = np.asarray(
    MMFFBatchedForcefield([m for _, m in ff_mols]).compute_energy().numpy(),
    np.float64,
)
(out / "regression_ff_energies.json").write_text(
    json.dumps(
        {
            "smiles": [s for s, _ in ff_mols],
            "seed": 12345,
            "uff": uff_e.tolist(),
            "mmff": mmff_e.tolist(),
        }
    )
)

# --- TFD on synthetic conformers ------------------------------------------
from nvmolkit_tpu.tfd import GetTFDMatrices  # noqa: E402

tfd_mols = []
for smi, m in ff_mols[:12]:
    m2 = mol_from_smiles(smi)
    m2.conformers = [
        (rng.standard_normal((m2.num_atoms, 3)) * 1.7).astype(np.float32)
        for _ in range(3)
    ]
    tfd_mols.append((smi, m2))
tfd_vals = [
    t.numpy().astype(np.float64).tolist()
    for t in GetTFDMatrices([m for _, m in tfd_mols])
]
(out / "regression_tfd.json").write_text(
    json.dumps({"smiles": [s for s, _ in tfd_mols], "tfd": tfd_vals})
)
print("ff + tfd regression goldens written")
