#!/usr/bin/env python3
"""Dev-loop replica of the driver's correctness gate: run after
`sbt "runMain graft.Verify <sfDir> <outDir>"`, compares each query's parquet
dump against its DuckDB oracle on the same tables. Not part of the library.
Usage: python3 tools/check.py <sfDir> <outDir> [query ...]
"""
import json, math, sys, glob

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    return str(v)


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    try:  # written by Verify (round 9+): query -> exception text
        verify_errs = json.load(open(f"{out_dir}/errors.json"))
    except Exception:
        verify_errs = {}
    n_ok = n_bad = 0
    for name, sql in sorted(oracles.items()):
        if only and name not in only:
            continue
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            why = verify_errs.get(name, "no spark output")
            print(f"FAIL {name}: {why}")
            n_bad += 1
            continue
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").df()
            want = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_bad += 1
            continue
        got = got[sorted(got.columns)]
        want = want[sorted(want.columns)]
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: columns {list(got.columns)} vs {list(want.columns)}")
            n_bad += 1
            continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} vs {len(want)}")
            n_bad += 1
            continue
        gl = [[norm_cell(v) for v in row] for row in got.itertuples(index=False)]
        wl = [[norm_cell(v) for v in row] for row in want.itertuples(index=False)]
        if gl != wl:
            bad = next(i for i in range(len(gl)) if gl[i] != wl[i])
            print(f"FAIL {name}: first diff row {bad}:\n  spark={gl[bad]}\n  duck ={wl[bad]}")
            n_bad += 1
            continue
        print(f"ok   {name} ({len(got)} rows)")
        n_ok += 1
    print(f"== {n_ok} ok, {n_bad} fail ==")
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
