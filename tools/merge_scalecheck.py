#!/usr/bin/env python3
"""Merge a focused ScaleCheck artifact into the primary tools/scalecheck.json.

The focused-run workflow (SPARK_GRAFT_SCALE_QUERIES=...) measures a subset
of ScaleCheck.Heavy without re-paying the full ~105-min 4-point sweep; its
rows are protocol-identical (same points, reps, interleave), so merging
per-query records is sound. Points must match exactly — a focused run at
different dirs/factors must not be mixed into the primary artifact.

Usage: python3 tools/merge_scalecheck.py tools/scalecheck_focused.json
Rewrites tools/scalecheck.json with merged queries and recomputed sums.
"""
import json, sys, os

root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
primary_path = os.path.join(root, "tools/scalecheck.json")
focused_path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
    root, "tools/scalecheck_focused.json")

primary = json.load(open(primary_path))
focused = json.load(open(focused_path))

pp = [(p["dir"], p["factor"]) for p in primary["points"]]
fp = [(p["dir"], p["factor"]) for p in focused["points"]]
assert pp == fp, f"point mismatch: primary {pp} vs focused {fp}"

for q, rec in focused["queries"].items():
    if rec.get("error"):
        print(f"SKIP {q}: focused run errored; keeping primary row if any")
        continue
    was = "replaced" if q in primary["queries"] else "added"
    primary["queries"][q] = rec
    print(f"{was} {q}: exponent {rec.get('exponent')}")

ok = [r for r in primary["queries"].values() if not r.get("error")]
sums = [sum(r["times"][i] for r in ok) for i in range(len(pp))]
for p, s in zip(primary["points"], sums):
    p["sum"] = round(s, 3)
primary["ratio_total"] = round(sums[-1] / sums[0], 3)

with open(primary_path, "w") as f:
    json.dump(primary, f)
print(f"wrote {primary_path}: {len(primary['queries'])} queries, "
      f"ratio_total {primary['ratio_total']}")
