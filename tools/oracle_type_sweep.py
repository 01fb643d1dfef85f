#!/usr/bin/env python3
"""Authoring-time oracle RESULT-TYPE sweep (r8 verdict #2) — the probe
that root-caused the r6-r8 hash-only reds: run every oracle SQL through
DuckDB and assert no result column is outside the allowlist
{ints, DOUBLE, VARCHAR, BOOLEAN, DATE, TIMESTAMP, list-of-same}.

HUGEINT (list_sum / un-cast window sum) and DECIMAL are the killers:
DuckDB's typed export maps them to decimal128, so the driver's typed
value hash sees Decimal(x) != int64(x) while rows_match and
family-normalized schema_match stay true — a red that reproduces ONLY
in the driver's environment. This sweep turns that class into a local,
seconds-fast authoring-time failure. check.py applies the same ban
per-query during full compares; this script needs only a dumped
oracle_sql.json (no Spark run) so it can gate an oracle-text edit
before any Verify sweep.

Usage: python3 tools/oracle_type_sweep.py <sfDir> <oracle_sql.json>
Exit 0 = all oracles allowlisted; 1 = any banned type or oracle error.
"""
import json
import sys

import duckdb

sys.path.insert(0, __file__.rsplit("/", 1)[0])
from check import TABLES, banned_oracle_type  # noqa: E402


def main():
    sf_dir, oracle_path = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(oracle_path))
    bad = 0
    for name, sql in sorted(oracle.items()):
        try:
            rel = con.sql(sql)
            for c, ty in zip(rel.columns, rel.types):
                reason = banned_oracle_type(ty)
                if reason:
                    print(f"BANNED {name}.{c}: {ty} -> {reason}")
                    bad += 1
        except Exception as e:
            print(f"ORACLE-ERROR {name}: {str(e)[:160]}")
            bad += 1
    print(f"swept {len(oracle)} oracles: "
          f"{'ALL ALLOWLISTED' if bad == 0 else f'{bad} BANNED/ERROR'}")
    sys.exit(0 if bad == 0 else 1)


if __name__ == "__main__":
    main()
