#!/usr/bin/env python3
"""Multi-JVM execution proof: run the gate set under
`local-cluster[2,8,4096]` — real separate executor JVMs launched by a
standalone Worker, real closure serialization, no shared driver heap or
tmp dirs — and assert per-query result hashes IDENTICAL to the local[N]
run, plus the normal DuckDB-oracle verdict on the cluster output.

Every claim the repo makes about the custom SparkPlan (ChunkedCollect),
codegen Expressions (VectorExpressions), DSv2 sources (ArrowIpcSource /
FlightSource) and spill paths surviving driver/executor process
separation is exercised here, not just in one shared JVM.

Usage: python3 tools/cluster_sweep.py [sf] [q1,q2,...]
  sf       scale factor (default 0.01 — the driver's gate SF)
  queries  optional filter (default: every SparkEntry.queries key)
  --speculation  third pass over the hash-determinism gates with
       pathological speculative execution (quantile 0 / multiplier 1 —
       a duplicate attempt for every at-least-median-duration task;
       local mode cannot run this, its scheduler never starts the
       speculation thread), asserting hashes still identical to local.

Env: LOCAL_OUT (default /tmp/graft_sweep/sf{sf} — reused if its hashes
     exist, e.g. from a prior sweep_all.py run; re-run locally otherwise),
     CLUSTER_OUT (default /tmp/graft_cluster/sf{sf}),
     CLUSTER_MASTER (default local-cluster[2,8,4096]).

Writes CORRECTNESS_cluster.json: per query {hash_equal_local, oracle}.
Exit 0 iff every query has hash_equal_local AND an OK/NO-ORACLE oracle row.
"""
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

ADD_OPENS = [
    f"--add-opens=java.base/{p}=ALL-UNNAMED" for p in [
        "java.lang", "java.lang.invoke", "java.lang.reflect", "java.io",
        "java.net", "java.nio", "java.util", "java.util.concurrent",
        "java.util.concurrent.atomic", "sun.nio.ch", "sun.nio.cs",
        "sun.security.action", "sun.util.calendar"]]


def run_verify(sf_dir, out_dir, master, queries=None, cpus="16",
               speculation=False):
    env = {**os.environ,
           "SPARK_GRAFT_CPUS": cpus,
           "SPARK_GRAFT_MASTER": master,
           **({"SPARK_GRAFT_SPECULATION": "1"} if speculation else {}),
           # the in-process standalone Worker launches executor JVMs via
           # the launcher lib, which needs these (normally exported by
           # load-spark-env.sh, which never runs here)
           "SPARK_HOME": "/opt/spark",
           "SPARK_SCALA_VERSION": "2.13",
           "SPARK_WORKER_DIR": "/tmp/graft_worker"}
    cmd = ["java"] + ADD_OPENS + [
        "-Xmx8g", "-Dspark.ui.enabled=false",
        "-Dspark.sql.session.timeZone=UTC",
        "-cp", "target/scala-2.13/classes:/opt/spark/jars/*",
        "graft.Verify", sf_dir, out_dir]
    if queries:
        cmd.append(",".join(queries))
    subprocess.run(cmd, cwd=REPO, check=True, env=env)


def hashes_of(out_dir):
    out = {}
    if not os.path.isdir(out_dir):
        return out
    for name in os.listdir(out_dir):
        h = os.path.join(out_dir, name, "_HASH.txt")
        if os.path.isfile(h):
            out[name] = open(h).read().strip()
    return out


# the gates whose operators advertise retry-stable hash determinism
# (RetryDeterminismSpec's set) — the speculation pass re-runs exactly these
SPECULATION_GATES = ["neighbor_sample", "random_walks", "node2vec_walks",
                     "group_sample", "sample_stratified", "corpus_split",
                     "dedup_keep_best", "neg_sample"]


def main():
    argv = [a for a in sys.argv[1:] if a != "--speculation"]
    speculation = "--speculation" in sys.argv[1:]
    sf = argv[0] if len(argv) > 0 else "0.01"
    queries = argv[1].split(",") if len(argv) > 1 else None
    sf_dir = f"/root/testdata/sf{sf}"
    local_out = os.environ.get("LOCAL_OUT", f"/tmp/graft_sweep/sf{sf}")
    cluster_out = os.environ.get("CLUSTER_OUT", f"/tmp/graft_cluster/sf{sf}")
    master = os.environ.get("CLUSTER_MASTER", "local-cluster[2,8,4096]")

    wanted = queries
    # --speculation preconditions are knowable from the CLI args alone —
    # check them BEFORE any multi-minute verify pass, and honor the
    # user's query filter (never run gates outside the requested set)
    spec_gates = [g for g in SPECULATION_GATES
                  if wanted is None or g in wanted] if speculation else []
    if speculation and not spec_gates:
        sys.exit("--speculation: none of the speculation gates are in "
                 "the selected query set")

    local_hashes = hashes_of(local_out)
    # with no filter, a leftover baseline from a prior FILTERED run would
    # silently narrow the comparison to its subset: an unfiltered sweep
    # must compare the FULL gate set, so a _FILTERED marker on the
    # baseline dir forces a re-run
    marker = os.path.join(local_out, "_FILTERED")
    if not local_hashes or \
            (wanted and not all(q in local_hashes for q in wanted)) or \
            (wanted is None and os.path.exists(marker)):
        print(f"=== local[16] baseline -> {local_out}", flush=True)
        # marker BEFORE the run, cleared only after a COMPLETE unfiltered
        # one: an interrupted baseline (filtered or not) must force a
        # later unfiltered sweep to re-run rather than silently compare
        # against a partial hash set
        os.makedirs(local_out, exist_ok=True)
        open(marker, "w").write(
            ",".join(sorted(wanted)) if wanted else "*incomplete*")
        run_verify(sf_dir, local_out, "local[16]", wanted)
        local_hashes = hashes_of(local_out)
        if wanted is None:
            os.remove(marker)

    print(f"=== {master} -> {cluster_out}", flush=True)
    run_verify(sf_dir, cluster_out, master, wanted)
    cluster_hashes = hashes_of(cluster_out)

    print("=== oracle check on cluster output", flush=True)
    res_json = f"{cluster_out}/_results.json"
    subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "check.py"),
         sf_dir, cluster_out, res_json], cwd=REPO, check=False)
    oracle = json.load(open(res_json)) if os.path.exists(res_json) else {}

    names = sorted(wanted or local_hashes.keys())
    rows, bad = {}, []
    for n in names:
        lh, ch = local_hashes.get(n), cluster_hashes.get(n)
        eq = lh is not None and lh == ch
        orc = oracle.get(n, "absent")
        rows[n] = {"hash_equal_local": eq, "local_hash": lh,
                   "cluster_hash": ch, "oracle": orc}
        if not eq or not (orc == "OK" or str(orc).startswith("NO-ORACLE")):
            bad.append(n)

    spec_rows = None
    if speculation:
        spec_out = f"{cluster_out}_speculation"
        # all requested speculation gates must be in the baseline (they
        # are, for an unfiltered or superset baseline) — an empty filter
        # would read as NO filter in run_verify
        spec_gates = [g for g in spec_gates if g in local_hashes]
        if not spec_gates:
            sys.exit("--speculation: baseline is missing every requested "
                     "speculation gate (inconsistent LOCAL_OUT?)")
        print(f"=== {master} + pathological speculation -> {spec_out}",
              flush=True)
        run_verify(sf_dir, spec_out, master, spec_gates, speculation=True)
        spec_hashes = hashes_of(spec_out)
        spec_rows = {}
        for n in spec_gates:
            eq = spec_hashes.get(n) == local_hashes.get(n) \
                and local_hashes.get(n) is not None
            spec_rows[n] = {"hash_equal_local": eq,
                            "speculation_hash": spec_hashes.get(n)}
            if not eq:
                bad.append(f"speculation:{n}")

    artifact = {"master": master, "sf": sf, "queries": len(names),
                "hash_equal": sum(1 for r in rows.values()
                                  if r["hash_equal_local"]),
                "rows": rows}
    if spec_rows is not None:
        artifact["speculation"] = spec_rows
    out_path = os.path.join(REPO, "CORRECTNESS_cluster.json")
    with open(out_path, "w") as f:
        json.dump(artifact, f, indent=1, sort_keys=True)
    print(f"\ncluster sweep: {artifact['hash_equal']}/{len(names)} "
          f"hash-identical to local, "
          f"{len(names) - len(bad)}/{len(names)} fully green -> {out_path}")
    if bad:
        print("FAILING:", ", ".join(bad[:40]))
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
