"""Size-sweep driver: run a harness over a grid, emit CSV + JSON rows.

Counterpart of the reference benchmarks' multi-size modes (its
harnesses loop molecule counts / batch sizes and tabulate; e.g.
``benchmarks/etkdg_bench.py``'s size grids). Each grid point runs in
its own subprocess (fresh TPU client — one crash or tunnel stall
cannot poison the sweep) and the last JSON line per metric is
collected.

  python benchmarks/sweep.py similarity              # default grid
  python benchmarks/sweep.py mmff --sizes 256,1024,4096
  python benchmarks/sweep.py etkdg --csv out.csv

Harness grids (sizes are the harness' first CLI argument):

  similarity  cross_similarity_bench.py   n_mols
  morgan      morgan_fp_bench.py          n_mols
  butina      butina_clustering_bench.py  n_mols
  mmff        ff_optimize_bench.py mmff N confs iters
  uff         ff_optimize_bench.py uff  N confs iters
  etkdg       etkdg_bench.py              n_mols
  substruct   substruct_bench.py          n_targets
"""
from __future__ import annotations

import argparse
import csv
import json
import subprocess
import sys
from pathlib import Path

HERE = Path(__file__).parent

GRIDS = {
    "similarity": ("cross_similarity_bench.py", [2048, 8192, 16384], lambda n: [str(n)]),
    "morgan": ("morgan_fp_bench.py", [1000, 4000, 10000], lambda n: [str(n)]),
    "butina": ("butina_clustering_bench.py", [2000, 8000, 20000], lambda n: [str(n)]),
    "mmff": (
        "ff_optimize_bench.py", [128, 512, 1024],
        lambda n: ["mmff", str(n), "4", "200"],
    ),
    "uff": (
        "ff_optimize_bench.py", [128, 512, 1024],
        lambda n: ["uff", str(n), "4", "200"],
    ),
    "etkdg": ("etkdg_bench.py", [128, 512, 1024], lambda n: [str(n)]),
    "substruct": ("substruct_bench.py", [500, 2000, 8000], lambda n: [str(n)]),
}


def run_point(script: str, args: list[str], timeout: int) -> list[dict]:
    proc = subprocess.run(
        [sys.executable, str(HERE / script), *args],
        capture_output=True, text=True, timeout=timeout,
    )
    rows = []
    for line in proc.stdout.splitlines():
        line = line.strip()
        if line.startswith("{"):
            try:
                rows.append(json.loads(line))
            except json.JSONDecodeError:
                pass
    if not rows:
        rows = [{
            "metric": script, "value": None, "error": True,
            "detail": proc.stderr[-500:],
        }]
    return rows


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("harness", choices=sorted(GRIDS))
    ap.add_argument("--sizes", help="comma-separated grid override")
    ap.add_argument("--csv", help="write rows to this CSV file")
    ap.add_argument("--timeout", type=int, default=1800)
    ns = ap.parse_args()

    script, sizes, make_args = GRIDS[ns.harness]
    if ns.sizes:
        sizes = [int(s) for s in ns.sizes.split(",")]

    all_rows: list[dict] = []
    for n in sizes:
        for row in run_point(script, make_args(n), ns.timeout):
            row["size"] = n
            all_rows.append(row)
            print(json.dumps(row), flush=True)

    if ns.csv:
        keys: list[str] = []
        for r in all_rows:
            for k in r:
                if k not in keys:
                    keys.append(k)
        with open(ns.csv, "w", newline="") as f:
            w = csv.DictWriter(f, fieldnames=keys)
            w.writeheader()
            w.writerows(all_rows)
        print(f"wrote {ns.csv} ({len(all_rows)} rows)", file=sys.stderr)


if __name__ == "__main__":
    main()
