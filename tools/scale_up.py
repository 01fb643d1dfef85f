#!/usr/bin/env python3
"""UPWARD scaling point (~sf1): time heavy gates at sf0.1 and at
SPARK_GRAFT_BLOWUP=10 x sf0.1 — TpchGraph.table unions 10 disjoint
key-remapped copies of each fact table (region/nation stay fixed
dimensions, the TPC-H scaling model). The committed two-point curve
(scaling_curve.json, sf0.01 -> sf0.1) shows the DOWNWARD decade; this
shows the one ABOVE the test data, where a super-linear candidate
generator or an unbounded pair join would actually surface. Payload
columns repeat across copies, so dedup/similarity gates run a
high-duplication regime (each doc has 9 exact twins) — bucket-bounded
candidate generation is exactly the claim being probed.

Usage: python3 tools/scale_up.py [query ...]
  (default: a curated scale-clean heavy set)
Env: SPARK_GRAFT_CPUS (default 32), RUNS (default 2), BLOWUP (default 10)

Writes SCALE_UP.json in the repo root (merge semantics like
scaling_curve.py); restores the committed bench_full.json afterwards.
"""
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BF = os.path.join(REPO, "bench_full.json")

# node2vec_walks (the UNBOUNDED variant) is deliberately absent: its
# documented supernode caveat becomes decisive at x10 — nations are
# fixed dimensions, so their degree grows with the blowup, and the
# per-step transform x array_contains is quadratic in hub degree
# (measured: one walk pass ran >35 min at x10 vs 10 s at sf0.1). The
# hub-BOUNDED variant below (maxNb=16 TopK adjacency) is the 100 TB
# path and is what the upward point measures.
DEFAULT = [
    "sql_q1", "four_cycles", "kcore", "dag_levels", "khop_2",
    "khop_dense", "node2vec_walks_hub", "dedup_ngram",
    "dedup_containment", "dedup_clusters", "cluster_safe_split",
    "decontaminate", "textrank_terms", "sim_topk", "bm25_topk",
    "tokenizer_bakeoff",
]


def bench(queries, cpus, runs, blowup=None):
    env = {**os.environ,
           "SPARK_GRAFT_SF_DIR": "/root/testdata/sf0.1",
           "SPARK_GRAFT_CPUS": cpus,
           "SPARK_GRAFT_BENCH_ONLY": ",".join(queries),
           "SPARK_GRAFT_BENCH_RUNS": runs}
    if blowup:
        env["SPARK_GRAFT_BLOWUP"] = str(blowup)
    else:
        env.pop("SPARK_GRAFT_BLOWUP", None)
    subprocess.run(["sbt", "-batch", "runMain graft.Bench"],
                   cwd=REPO, check=True, env=env,
                   stdout=subprocess.DEVNULL)
    return json.load(open(BF))["queries"]


def main():
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    runs = os.environ.get("RUNS", "2")
    blowup = int(os.environ.get("BLOWUP", "10"))
    queries = sys.argv[1:] or DEFAULT
    saved = open(BF).read()
    try:
        print(f"=== sf0.1 ({len(queries)} queries, min-of-{runs})",
              flush=True)
        base = bench(queries, cpus, runs)
        print(f"=== sf0.1 x{blowup} blowup (min-of-{runs})", flush=True)
        big = bench(queries, cpus, runs, blowup)
    finally:
        open(BF, "w").write(saved)
    rows = []
    for q in queries:
        s, b = base.get(q), big.get(q)
        if not s or not b:
            continue
        rows.append({"query": q, "sf0.1_sec": s, f"x{blowup}_sec": b,
                     "ratio": round(b / s, 2)})
    if not rows:
        # don't clobber the committed artifact (or crash in the summary
        # print) after two full bench passes that measured nothing
        sys.exit("no query produced both measurements; "
                 "SCALE_UP.json left untouched")
    path = os.path.join(REPO, "SCALE_UP.json")
    if os.path.exists(path):
        # merge only rows measured at the SAME blowup — a mixed-ratio
        # artifact under one data_ratio label would lie, and the
        # summary print would KeyError on the other ratio's column
        prior = {r["query"]: r for r in json.load(open(path))["rows"]
                 if f"x{blowup}_sec" in r}
    else:
        prior = {}
    for r in rows:
        prior[r["query"]] = r
    rows = sorted(prior.values(), key=lambda r: -r["ratio"])
    out = {"data_ratio": float(blowup), "runs_per_point": int(runs),
           "rows": rows}
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    w = max(len(r["query"]) for r in rows)
    print(f"\n{'query'.ljust(w)}  sf0.1   x{blowup}   ratio "
          f"(data {blowup}x)")
    for r in rows:
        print(f"{r['query'].ljust(w)}  {r['sf0.1_sec']:6.2f}  "
              f"{r[f'x{blowup}_sec']:6.2f}  {r['ratio']:5.2f}")


if __name__ == "__main__":
    main()


