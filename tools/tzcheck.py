#!/usr/bin/env python3
"""Oracle timezone-independence gate.

Every declared oracle must return identical rows regardless of the DuckDB
session TimeZone (SURVEY §5.3: the harness's comparator connects with the
system zone, which the builder does not control). TIMESTAMPTZ ± INTERVAL is
calendar math in the session zone, so a stray TIMESTAMPTZ arithmetic in an
oracle diverges exactly on machines in DST zones — the failure mode fixed in
q_flagship (round 5). This sweep runs every oracle under UTC and under a
maximally-shifted zone (UTC+14) and fails on any difference.

Usage: python3 tools/tzcheck.py <sfDir> <verifyOutDir>
  (<verifyOutDir> must contain oracle_sql.json from a graft.Verify run)
"""
import json
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def connect(sf_dir: str, tz: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    con.execute(f"SET TimeZone='{tz}'")
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def main() -> None:
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    base = connect(sf_dir, "UTC")
    shifted = connect(sf_dir, "Pacific/Kiritimati")  # UTC+14, no DST excuse
    bad = []
    for name in sorted(oracles):
        sql = oracles[name]
        try:
            if base.execute(sql).fetchall() != shifted.execute(sql).fetchall():
                bad.append(name)
                print(f"TZDIFF {name}")
            else:
                print(f"ok   {name}")
        except Exception as e:  # an oracle erroring here is also a failure
            bad.append(name)
            print(f"ERR  {name}: {e}")
    print(f"== {len(oracles) - len(bad)} ok, {len(bad)} tz-divergent ==")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
