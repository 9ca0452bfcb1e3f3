#!/usr/bin/env python
"""Convert the MMFF94 .PAR distribution into the embedded JSON payload.

Run this ON A MACHINE THAT HAS THE .PAR FILES (the CCL archive, or an
RDKit/OpenBabel source tree ships them) and commit the resulting
``nvmolkit_tpu/models/mmff/data/mmff94_params.json.gz``. Once the file
is committed, ``default_provider()`` resolves to the table-exact
parameter provider in RDKit-less deployments (tier 3 — see
``models/mmff/providers.py``), demoting the empirical rules to
out-of-table fill-in only.

    python tools/embed_mmff_par.py --dir /path/to/MMFF94_files

The environment this framework is built in ships neither RDKit nor the
.PAR files (no egress), so exactness is delivered as machinery plus
this one offline command — the same posture as tools/generate_goldens.py.
"""
from __future__ import annotations

import argparse
import gzip
import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", required=True, help="directory with MMFF*.PAR files")
    ap.add_argument(
        "--out",
        default=str(
            REPO / "nvmolkit_tpu" / "models" / "mmff" / "data" / "mmff94_params.json.gz"
        ),
    )
    args = ap.parse_args()

    from nvmolkit_tpu.models.mmff.params_files import MMFFParameterTables

    tables = MMFFParameterTables(args.dir)
    counts = {
        "bond": len(tables.bond), "angle": len(tables.angle),
        "stbn": len(tables.stbn), "tor": len(tables.tor),
        "oop": len(tables.oop), "vdw": len(tables.vdw),
        "chg": len(tables.chg), "defaults": len(tables.defaults),
    }
    if not any(counts.values()):
        sys.exit(f"no MMFF*.PAR rows parsed under {args.dir}")
    out = Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    with gzip.open(out, "wt") as f:
        json.dump(tables.to_payload(), f)
    print(f"wrote {out} ({counts})")


if __name__ == "__main__":
    main()
