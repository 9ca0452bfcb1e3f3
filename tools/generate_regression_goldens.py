#!/usr/bin/env python
"""Snapshot this implementation's outputs as regression goldens
(tests/golden/regression_*.json). NOT external validation — guards
refactors. Regenerate deliberately when behavior changes on purpose."""
import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

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
