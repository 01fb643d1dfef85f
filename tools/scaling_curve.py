#!/usr/bin/env python3
"""Scaling-curve evidence for the 100x claim (r7 verdict #6): time the
heaviest gates at sf0.01 AND sf0.1 (min-of-N via graft.Bench's BENCH_ONLY/
BENCH_RUNS), and report the wall-time ratio against the ~10x data ratio.
A gate scaling super-linearly beyond its documented inherent output growth
(the khop family) is the 100x red flag a single-SF bench can't show.

Usage: python3 tools/scaling_curve.py [query ...]
  (default: the 10 heaviest from the committed bench_full.json)
Env: SPARK_GRAFT_CPUS (default 32), RUNS (default 2)

Writes scaling_curve.json in the repo root; restores the committed
bench_full.json afterwards (graft.Bench overwrites it per run).
"""
import json
import os
import shutil
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BF = os.path.join(REPO, "bench_full.json")


def bench(sf_dir, queries, cpus, runs):
    env = {**os.environ,
           "SPARK_GRAFT_SF_DIR": sf_dir,
           "SPARK_GRAFT_CPUS": cpus,
           "SPARK_GRAFT_BENCH_ONLY": ",".join(queries),
           "SPARK_GRAFT_BENCH_RUNS": runs}
    subprocess.run(["sbt", "-batch", "runMain graft.Bench"],
                   cwd=REPO, check=True, env=env,
                   stdout=subprocess.DEVNULL)
    return json.load(open(BF))["queries"]


def main():
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    runs = os.environ.get("RUNS", "2")
    committed = json.load(open(BF))["queries"]
    queries = sys.argv[1:] or [
        k for k, _ in sorted(committed.items(), key=lambda kv: -kv[1])[:10]]
    saved = open(BF).read()
    try:
        print(f"=== sf0.01 ({len(queries)} queries, min-of-{runs})",
              flush=True)
        small = bench("/root/testdata/sf0.01", queries, cpus, runs)
        print(f"=== sf0.1 ({len(queries)} queries, min-of-{runs})",
              flush=True)
        big = bench("/root/testdata/sf0.1", queries, cpus, runs)
    finally:
        open(BF, "w").write(saved)
    rows = []
    for q in queries:
        s, b = small.get(q), big.get(q)
        if not s or not b:
            continue
        rows.append({"query": q, "sf0.01_sec": s, "sf0.1_sec": b,
                     "ratio": round(b / s, 2)})
    # MERGE into the committed artifact: re-measuring a subset must not
    # drop the other rows' evidence (r9 — incremental per-gate re-runs)
    curve_path = os.path.join(REPO, "scaling_curve.json")
    if os.path.exists(curve_path):
        prior = {r["query"]: r for r in json.load(open(curve_path))["rows"]}
    else:
        prior = {}
    for r in rows:
        prior[r["query"]] = r
    rows = sorted(prior.values(), key=lambda r: -r["ratio"])
    out = {"data_ratio": 10.0, "runs_per_point": int(runs), "rows": rows}
    with open(curve_path, "w") as f:
        json.dump(out, f, indent=1)
    w = max(len(r["query"]) for r in rows)
    print(f"\n{'query'.ljust(w)}  sf0.01   sf0.1   ratio (data 10x)")
    for r in rows:
        print(f"{r['query'].ljust(w)}  {r['sf0.01_sec']:6.2f}  "
              f"{r['sf0.1_sec']:6.2f}  {r['ratio']:5.2f}")


if __name__ == "__main__":
    main()
