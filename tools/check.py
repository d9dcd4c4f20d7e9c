#!/usr/bin/env python3
"""Dev-loop replica of the driver's correctness gate: run after
`sbt "runMain graft.Verify <sfDir> <outDir>"`, compares each query's parquet
dump against its DuckDB oracle on the same tables. Not part of the library.
Usage: python3 tools/check.py <sfDir> <outDir> [query ...]
       python3 tools/check.py --bench   # bench_last vs bench_ref w/ spread
"""
import json, math, sys, glob

import duckdb


def bench_report():
    """Surface tools/bench_last.json against tools/bench_ref.json with the
    per-query rep spread as the error bar (VERDICT r10 ask #8): a query is
    flagged only when its min exceeds 2x the quiet reference AND its own
    reps agreed (small spread) — a wide spread says ambient load, not code.
    """
    import os
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    last = json.load(open(f"{root}/tools/bench_last.json"))
    ref = json.load(open(f"{root}/tools/bench_ref.json"))
    spreads = last.get("spread", {})
    rows = []
    for q, t in sorted(last["queries"].items()):
        r = ref.get(q)
        if t is None or t < 0 or not r or r <= 0:
            continue
        sp = spreads.get(q, {}).get("spread", 0.0)
        reps = spreads.get(q, {}).get("reps", 0)
        ratio = t / r
        # REGRESSION requires >=4 reps agreeing (Bench guarantees >=4 for
        # any >1.8x reading since r12); a >2x at <4 reps is stale-bench
        # evidence, not adjudicable -> "needs-reps".
        flag = ("REGRESSION" if ratio > 2 and sp < 0.25 and reps >= 4 else
                "needs-reps" if ratio > 2 and sp < 0.25 else
                "noisy" if ratio > 2 else "")
        rows.append((ratio, q, t, r, sp, reps, flag))
    rows.sort(reverse=True)
    print(f"{'query':26s} {'last':>8s} {'ref':>8s} {'ratio':>6s} "
          f"{'spread':>7s} {'reps':>4s}")
    for ratio, q, t, r, sp, reps, flag in rows[:15]:
        print(f"{q:26s} {t:8.2f} {r:8.2f} {ratio:6.2f} {sp:7.2f} "
              f"{reps:4d} {flag}")
    cal = last.get("calibration", {})
    print(f"calibration: scan={cal.get('q_scan_parquet')} "
          f"ref={cal.get('ref_q_scan_parquet')} ref_total={cal.get('ref_total')}")
    n_reg = sum(1 for r in rows if r[6] == "REGRESSION")
    print(f"== {len(rows)} compared, {n_reg} load-robust regressions ==")
    sys.exit(1 if n_reg else 0)

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    return str(v)


def main():
    if sys.argv[1:2] == ["--bench"]:
        bench_report()
        return
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
