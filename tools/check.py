#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: for each query result
parquet under OUTDIR, run the matching oracle SQL from oracle_sql.json in
DuckDB over the raw testdata parquet, sort columns by name + rows, and
compare row counts, schemas (loosely) and value hashes.

Usage: python3 tools/check.py <sfDir> <outDir>

Reader-side sweep hygiene (the r5/r6 red rows were artifact mixing, not
code): before touching any result dir we (1) take the sweep _LOCK in
SHARED mode — graft.Verify holds it EXCLUSIVE for the whole sweep via
fcntl/POSIX record locks (Java FileChannel.lock ⇄ Python fcntl.lockf
interoperate on Linux), so a compare blocks until no writer is active and
writers block until no compare is active; (2) hard-fail if the sweep-level
_SFDIR.txt doesn't name the sfDir we're comparing against; (3) hard-fail
any individual result dir whose embedded _SF.txt (written inside the tmp
dir, so it travels with Verify's atomic rename) disagrees — a stale or
cross-SF result can then never pass silently.
"""
import sys, os, json, glob, fcntl, hashlib, datetime, decimal
import duckdb
import pandas as pd
import numpy as np

EPOCH = datetime.datetime(1970, 1, 1)


def canon_cell(v):
    """Mirror of graft.Verify's canonCell — the canonical cell encoding
    behind _HASH.txt. Any edit here must be mirrored in Verify.scala."""
    if v is None:
        return "\x00NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        if v != v:
            return "NaN"
        if v == float("inf"):
            return "Inf"
        if v == float("-inf"):
            return "-Inf"
        return "%.17e" % v
    if isinstance(v, (bytes, bytearray)):
        return "0x" + v.hex()
    if isinstance(v, datetime.datetime):
        if v.tzinfo is not None:
            v = v.astimezone(datetime.timezone.utc).replace(tzinfo=None)
        return str((v - EPOCH) // datetime.timedelta(microseconds=1))
    if isinstance(v, datetime.date):
        # epoch days, mirroring Verify.canonCell's tz-independent form
        return "d" + str((v - EPOCH.date()).days)
    if isinstance(v, decimal.Decimal):
        return str(v.normalize())
    if isinstance(v, (list, tuple, np.ndarray)):
        return "[" + ",".join(canon_cell(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(sorted(
            canon_cell(k) + "=" + canon_cell(x) for k, x in v.items())) + "}"
    if isinstance(v, (np.floating,)):
        return canon_cell(float(v))
    if isinstance(v, (np.integer,)):
        return str(int(v))
    return str(v)


def canon_digest(rel):
    """SHA-256 over rows of a DuckDB relation, columns sorted by name, rows
    sorted as their encoded lines — graft.Verify's digest() in Python."""
    cols = sorted(rel.columns)
    rel2 = rel.project(", ".join('"%s"' % c for c in cols))
    lines = ["\x01".join(canon_cell(v) for v in row)
             for row in rel2.fetchall()]
    lines.sort()
    md = hashlib.sha256()
    for l in lines:
        md.update(l.encode("utf-8"))
        md.update(b"\n")
    return md.hexdigest()

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm_type(t: str) -> str:
    """Normalize a DuckDB type name to the VALUE REPRESENTATION the driver's
    typed hash sees (pyarrow → python objects): int width never matters (all
    ints hash as python int), but DECIMAL hashes as Decimal — never equal to
    a float of identical value. That is exactly how sql_q9 failed in r04
    with schema_match still true, so decimal-vs-float must FAIL here."""
    t = t.upper()
    if t.endswith("[]"):
        return "list<" + norm_type(t[:-2]) + ">"
    if "[" in t:  # fixed-size array e.g. DOUBLE[3]
        return "list<" + norm_type(t[: t.index("[")]) + ">"
    if t == "HUGEINT":
        # NEVER fold into "int": DuckDB's typed export maps HUGEINT to
        # decimal128, so the driver hashes Decimal(123) != int64(123) while
        # rows/schema match — the r8 dedup_semantic/embed_drift/
        # hard_negatives/neg_sample_weighted signature (and r4's sql_q9 for
        # DECIMAL). A distinct tag makes the TYPES check fail loudly here
        # at authoring time instead of hash-only in the driver.
        return "hugeint-BANNED(cast to BIGINT in the oracle)"
    if t in ("TINYINT", "SMALLINT", "INTEGER", "BIGINT",
             "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT"):
        return "int"
    if t in ("FLOAT", "DOUBLE", "REAL"):
        return "float"
    if t.startswith("DECIMAL"):
        return "decimal-BANNED(cast to BIGINT or DOUBLE in the oracle)"
    if t.startswith("TIMESTAMP"):
        return "timestamp"
    return t.lower()


# the full closed set of oracle result types: anything else (HUGEINT,
# DECIMAL, UUID, INTERVAL, structs, …) either hash-diverges in the
# driver's typed export or is untested — ban at authoring time.
_ALLOWED = {"int", "float", "varchar", "boolean", "date", "timestamp"}


def banned_oracle_type(raw: str):
    """Return a reason string if a DuckDB result type is outside the
    allowlist {ints, DOUBLE, VARCHAR, BOOLEAN, DATE, TIMESTAMP,
    list-of-same}, else None."""
    n = norm_type(str(raw))
    while n.startswith("list<") and n.endswith(">"):
        n = n[5:-1]
    if n not in _ALLOWED:
        return n
    return None


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize dtypes: ints -> int64 (nullable), floats -> float64
    for c in df.columns:
        if pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("Int64")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
    df = df.sort_values(by=list(df.columns), kind="mergesort",
                        na_position="last").reset_index(drop=True)
    return df


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    # shared lock against graft.Verify's exclusive sweep lock: blocks while
    # a sweep is rewriting this outdir, and keeps a sweep from starting
    # mid-compare. Held for the whole compare (released on process exit).
    lock_fd = os.open(os.path.join(out_dir, "_LOCK"),
                      os.O_CREAT | os.O_RDWR, 0o644)
    fcntl.lockf(lock_fd, fcntl.LOCK_SH)
    sfdir_marker = os.path.join(out_dir, "_SFDIR.txt")
    if os.path.exists(sfdir_marker):
        marked = open(sfdir_marker).read().strip()
        # realpath, not normpath: a relative vs absolute spelling of the
        # SAME directory must compare equal (ADVICE r7)
        if os.path.realpath(marked) != os.path.realpath(sf_dir):
            print(f"FATAL: outdir {out_dir} was written from sfDir "
                  f"'{marked}' but this compare targets '{sf_dir}' — "
                  "refusing to mix scale factors", file=sys.stderr)
            sys.exit(2)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    results = {}
    # iterate oracle keys UNION result dirs UNION the failure marker: a
    # crashed query must count as FAIL even when it has no oracle entry
    # (the rows-only queries would otherwise vanish from the denominator
    # entirely once Verify deletes their stale result dir)
    result_dirs = {n for n in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, n))
                   and not n.startswith(".")}  # .tmp_* = crashed rename
    failed_marker = os.path.join(out_dir, "_FAILED.txt")
    failed = set()
    if os.path.exists(failed_marker):
        failed = {l.strip() for l in open(failed_marker) if l.strip()}
    for name in sorted(result_dirs | set(oracle.keys()) | failed):
        d = os.path.join(out_dir, name)
        if name not in result_dirs:
            results[name] = "MISSING (query failed or absent in Verify)"
            continue
        # per-result provenance: _SF.txt rides inside the atomically-renamed
        # result dir. Missing marker (pre-r7 artifact) or mismatched SF both
        # FAIL loudly — this is the exact r5/r6 silent-hash-fail signature.
        sf_txt = os.path.join(d, "_SF.txt")
        if os.path.exists(sf_txt):
            got_sf = open(sf_txt).read().strip()
            if os.path.realpath(got_sf) != os.path.realpath(sf_dir):
                results[name] = (f"SF-MIX result written from '{got_sf}' "
                                 f"but compared against '{sf_dir}'")
                continue
        else:
            # a result dir with no marker predates this sweep's Verify —
            # exactly the stale-artifact mixing this gate exists to stop
            results[name] = "NO-PROVENANCE (missing _SF.txt — stale result?)"
            continue
        files = glob.glob(os.path.join(d, "*.parquet"))
        got = pd.concat([pd.read_parquet(f) for f in files]) if files \
            else pd.DataFrame()
        if name not in oracle:
            results[name] = f"NO-ORACLE rows={len(got)}"
            continue
        try:
            rel = con.sql(oracle[name])
            want = rel.df()
            want_types = {c: norm_type(str(t))
                          for c, t in zip(rel.columns, rel.types)}
        except Exception as e:
            results[name] = f"ORACLE-ERROR {e}"
            continue
        # authoring-time ban (VERDICT r8 #2): an oracle whose RESULT column
        # is HUGEINT/DECIMAL/other exotic can never be intended — it fails
        # here, not hash-only in the driver.
        obad = [(c, banned_oracle_type(t))
                for c, t in zip(rel.columns, rel.types)
                if banned_oracle_type(t)]
        if obad:
            results[name] = "ORACLE-TYPE-BANNED " + ", ".join(
                f"{c}: {r}" for c, r in obad)
            continue
        # typed-representation check via DuckDB's view of BOTH sides (the
        # pandas path below coerces to float64 and would mask decimal/double)
        srel = con.sql(f"SELECT * FROM read_parquet('{d}/*.parquet')")
        got_types = {c: norm_type(str(t))
                     for c, t in zip(srel.columns, srel.types)}
        tbad = [c for c in got_types
                if c in want_types and got_types[c] != want_types[c]]
        if tbad:
            results[name] = "TYPES " + ", ".join(
                f"{c}: got={got_types[c]} want={want_types[c]}" for c in tbad)
            continue
        g, w = canon(got), canon(want)
        if list(g.columns) != list(w.columns):
            results[name] = f"COLS got={list(g.columns)} want={list(w.columns)}"
            continue
        if len(g) != len(w):
            results[name] = f"ROWS got={len(g)} want={len(w)}"
            continue
        mismatches = []
        for c in g.columns:
            a, b = g[c], w[c]
            if pd.api.types.is_float_dtype(a) or pd.api.types.is_float_dtype(b):
                aa = a.astype("float64").to_numpy()
                bb = b.astype("float64").to_numpy()
                ok = np.allclose(aa, bb, rtol=0, atol=0, equal_nan=True)
                exact = np.array_equal(aa, bb, equal_nan=True)
                if not ok:
                    mismatches.append(c)
                elif not exact:
                    mismatches.append(c + "(float-inexact)")
            else:
                if not a.astype(str).equals(b.astype(str)):
                    mismatches.append(c)
        if not mismatches:
            results[name] = "OK"
        else:
            # forensic digests (r8): Verify's _HASH.txt (spark side as the
            # WRITER saw it) vs the same canonical digest recomputed here
            # from the parquet and from the oracle — a red row now names
            # which engine moved
            hash_txt = os.path.join(d, "_HASH.txt")
            sdig_v = (open(hash_txt).read().strip()
                      if os.path.exists(hash_txt) else "absent")
            try:
                sdig, odig = canon_digest(srel), canon_digest(rel)
            except Exception as e:  # digest is forensics, never the verdict
                sdig = odig = f"digest-error {e}"
            results[name] = (f"VALUES {mismatches} [spark={sdig_v[:16]} "
                             f"spark_recalc={sdig[:16]} oracle={odig[:16]}]")
    bad = 0
    for k, v in sorted(results.items()):
        flag = "PASS" if v == "OK" or v.startswith("NO-ORACLE") else "FAIL"
        if flag == "FAIL":
            bad += 1
        print(f"{flag:4} {k}: {v}")
    print(f"\n{len(results) - bad}/{len(results)} pass")
    # optional 3rd arg: write the per-query verdict map as JSON (consumed
    # by tools/sweep_all.py to build the combined cross-SF artifact)
    if len(sys.argv) > 3:
        with open(sys.argv[3], "w") as f:
            json.dump(results, f, indent=1, sort_keys=True)
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
