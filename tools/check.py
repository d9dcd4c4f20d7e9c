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
    # needs-reps is NOT a pass (ADVICE r12): Bench's >=4-rep guarantee only
    # holds when the extra passes SUCCEED — a flaky >2x low-spread reading
    # is exactly the regressed regime, so it must not exit 0. Distinct
    # status 2 so callers can tell "re-run Bench" from "real regression".
    n_need = sum(1 for r in rows if r[6] == "needs-reps")
    print(f"== {len(rows)} compared, {n_reg} load-robust regressions, "
          f"{n_need} needs-reps ==")
    sys.exit(1 if n_reg else (2 if n_need else 0))


def refdiff_report(new_ref_path):
    """Gate a bench_ref re-baseline (ADVICE r12): compare the CANDIDATE
    reference against the committed tools/bench_ref.json per query, so a
    wholesale refresh can't silently absorb a real slowdown into the new
    baseline. Flags any query whose new ref is >1.5x the old one.
    Usage: python3 tools/check.py --refdiff <candidate_ref.json>
    """
    import os
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    old = json.load(open(f"{root}/tools/bench_ref.json"))
    newd = json.load(open(new_ref_path))
    if isinstance(old, dict) and "queries" in old:
        old = old["queries"]
    if isinstance(newd, dict) and "queries" in newd:
        newd = newd["queries"]
    rows = []
    for q, t_new in sorted(newd.items()):
        t_old = old.get(q)
        if not isinstance(t_new, (int, float)) or t_new <= 0 or \
           not isinstance(t_old, (int, float)) or t_old <= 0:
            continue
        rows.append((t_new / t_old, q, t_old, t_new))
    rows.sort(reverse=True)
    print(f"{'query':26s} {'old_ref':>8s} {'new_ref':>8s} {'ratio':>6s}")
    for ratio, q, t_old, t_new in rows[:15]:
        flag = "DRIFT" if ratio > 1.5 else ""
        print(f"{q:26s} {t_old:8.2f} {t_new:8.2f} {ratio:6.2f} {flag}")
    n_drift = sum(1 for r in rows if r[0] > 1.5)
    print(f"== {len(rows)} compared, {n_drift} refs drifted >1.5x — "
          f"adjudicate each before committing the new baseline ==")
    sys.exit(1 if n_drift else 0)

def scale_report(path=None):
    """Adjudicate scalecheck exponents mechanically (VERDICT r12 ask #6):
    a query is flagged only when its final-segment exponent exceeds its
    declared model (+0.1 tolerance) AND the band floor from ScaleCheck's
    same-JVM re-run stays above the model too — a one-off ambient-load
    flip collapses on the re-run, a real superlinear regression doesn't.
    Usage: python3 tools/check.py --scale [scalecheck.json]
    """
    import os
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    data = json.load(open(path or f"{root}/tools/scalecheck.json"))
    n_flag = n_noise = n_err = 0
    for q, rec in sorted(data.get("queries", {}).items()):
        if rec.get("error"):
            print(f"ERROR {q}: measurement failed")
            n_err += 1
            continue
        model = 1.0
        m = rec.get("model", "")
        try:
            model = float(m.split(":")[0])
        except (ValueError, IndexError):
            pass
        expo = rec.get("exponent")
        if expo is None or expo <= model + 0.1:
            continue
        band = rec.get("exponent_band")
        if band and min(band) <= model + 0.1:
            print(f"noise {q}: exponent {expo:.2f} vs model {model:.1f}, "
                  f"re-run band [{band[0]:.2f}, {band[1]:.2f}] touches model")
            n_noise += 1
        elif band:
            print(f"FLAG  {q}: exponent {expo:.2f} vs model {model:.1f}, "
                  f"band floor {min(band):.2f} STAYS above — real growth")
            n_flag += 1
        else:
            print(f"FLAG  {q}: exponent {expo:.2f} vs model {model:.1f}, "
                  f"no re-run band recorded (old artifact?) — adjudicate")
            n_flag += 1
    print(f"== {n_flag} flagged, {n_noise} noise-banded, {n_err} errored ==")
    sys.exit(1 if (n_flag or n_err) else 0)


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
    if sys.argv[1:2] == ["--refdiff"]:
        refdiff_report(sys.argv[2])
        return
    if sys.argv[1:2] == ["--scale"]:
        scale_report(sys.argv[2] if len(sys.argv) > 2 else None)
        return
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    import os
    con = duckdb.connect()
    for t in TABLES:
        # driver testdata ships single parquet FILES; DataVariant/ScaleGen
        # outputs are Spark parquet DIRECTORIES of part files — glob those
        p = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(p):
            p = f"{p}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
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
