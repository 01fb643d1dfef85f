#!/usr/bin/env python3
"""Cross-SF correctness sweep: run graft.Verify at every scale factor into
a PER-SF outdir (never shared — Verify's lock + _SFDIR marker make sharing
safe, but per-SF dirs make staleness structurally impossible), check each
against the DuckDB oracle, and merge into ONE committed artifact
(CORRECTNESS_local.json) so a driver-side artifact mismatch is detectable
by diffing local vs driver rows.

Usage: python3 tools/sweep_all.py [sf ...]       (default: 0.001 0.01 0.1)
Env: SPARK_GRAFT_CPUS (default 16), SWEEP_OUT (default /tmp/graft_sweep)
"""
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    sfs = sys.argv[1:] or ["0.001", "0.01", "0.1"]
    out_base = os.environ.get("SWEEP_OUT", "/tmp/graft_sweep")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "16")
    combined = {}
    for sf in sfs:
        sf_dir = f"/root/testdata/sf{sf}"
        out_dir = f"{out_base}/sf{sf}"
        print(f"=== Verify sf{sf} -> {out_dir}", flush=True)
        subprocess.run(
            ["sbt", "-batch", f"runMain graft.Verify {sf_dir} {out_dir}"],
            cwd=REPO, check=True, env={**os.environ,
                                       "SPARK_GRAFT_CPUS": cpus})
        res_json = f"{out_dir}/_results.json"
        print(f"=== check sf{sf}", flush=True)
        # check.py exits 1 on any FAIL; keep sweeping — the combined
        # artifact must show the failure, not hide the other SFs
        subprocess.run(
            [sys.executable, os.path.join(REPO, "tools", "check.py"),
             sf_dir, out_dir, res_json], cwd=REPO, check=False)
        combined[f"sf{sf}"] = json.load(open(res_json))
    # upstream-client interop gate: the stock pyarrow.flight client must
    # complete the full verb set against the gRPC server (a self-verified
    # wire is not proof; see tools/flight_interop.py). One merged row per
    # interop step so a wire regression reds the sweep like any oracle
    # mismatch.
    print("=== flight interop (upstream pyarrow client)", flush=True)
    rc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "flight_interop.py"),
         "/root/testdata/sf0.001"], cwd=REPO, check=False).returncode
    try:
        steps = json.load(open(os.path.join(REPO, "INTEROP.json")))["steps"]
    except Exception:
        steps = {"interop_run": "FAILED to produce INTEROP.json"}
    combined["interop"] = {
        f"flight_interop:{k}": ("OK" if v == "pass" else f"FAIL {v}")
        for k, v in steps.items()}
    if rc != 0:
        combined["interop"]["flight_interop:exit"] = f"FAIL rc={rc}"
    # and the reverse direction: graft client + DSv2 reader against a
    # stock pyarrow.flight SERVER (tools/flight_reverse_interop.py)
    print("=== flight reverse interop (graft client -> upstream server)",
          flush=True)
    rc2 = subprocess.run(
        [sys.executable,
         os.path.join(REPO, "tools", "flight_reverse_interop.py")],
        cwd=REPO, check=False).returncode
    try:
        steps2 = json.load(
            open(os.path.join(REPO, "INTEROP_REVERSE.json")))["steps"]
    except Exception:
        steps2 = {"reverse_run": "FAILED to produce INTEROP_REVERSE.json"}
    combined["interop"].update({
        f"flight_reverse:{k}": ("OK" if v == "pass" else f"FAIL {v}")
        for k, v in steps2.items()})
    if rc2 != 0:
        combined["interop"]["flight_reverse:exit"] = f"FAIL rc={rc2}"
    out_path = os.path.join(REPO, "CORRECTNESS_local.json")
    with open(out_path, "w") as f:
        json.dump(combined, f, indent=1, sort_keys=True)
    total = sum(len(v) for v in combined.values())
    ok = sum(1 for v in combined.values() for r in v.values()
             if r == "OK" or r.startswith("NO-ORACLE"))
    print(f"\ncombined: {ok}/{total} pass -> {out_path}")
    sys.exit(0 if ok == total else 1)


if __name__ == "__main__":
    main()
