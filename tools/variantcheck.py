#!/usr/bin/env python3
"""Robustness-to-data sweep summarizer (VERDICT r12 ask #1): after running
graft.DataVariant (seed/skew) + graft.Verify over each variant directory,
this replays tools/check.py's oracle compare per variant and writes ONE
artifact, tools/datavariants.json, recording per-variant ok/fail counts and
the failing query names — so "the adaptive thresholds aren't overfit to the
single driver seed" is a recorded measurement, not an assertion.

Usage: python3 tools/variantcheck.py <label>:<sfDir>:<outDir> [...]
"""
import json, os, re, subprocess, sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_check(sf_dir, out_dir):
    p = subprocess.run(
        [sys.executable, f"{ROOT}/tools/check.py", sf_dir, out_dir],
        capture_output=True, text=True)
    fails = [ln for ln in p.stdout.splitlines() if ln.startswith("FAIL ")]
    m = re.search(r"== (\d+) ok, (\d+) fail ==", p.stdout)
    n_ok, n_bad = (int(m.group(1)), int(m.group(2))) if m else (0, -1)
    return n_ok, n_bad, fails


def main():
    args = sys.argv[1:]
    out_name = "datavariants.json"
    if args[:1] == ["--out"]:
        out_name = args[1]
        args = args[2:]
    variants = []
    for spec in args:
        label, sf_dir, out_dir = spec.split(":", 2)
        n_ok, n_bad, fails = run_check(sf_dir, out_dir)
        print(f"[variantcheck] {label}: {n_ok} ok, {n_bad} fail")
        for f in fails:
            print(f"  {f}")
        variants.append({
            "label": label, "sf_dir": sf_dir, "out_dir": out_dir,
            "ok": n_ok, "fail": n_bad,
            "failures": [f.split(":", 1)[0].replace("FAIL ", "").strip()
                         for f in fails],
        })
    record = {"variants": variants,
              "all_green": all(v["fail"] == 0 for v in variants)}
    path = f"{ROOT}/tools/{out_name}"
    with open(path, "w") as w:
        json.dump(record, w, indent=1)
    print(f"[variantcheck] wrote {path} all_green={record['all_green']}")
    sys.exit(0 if record["all_green"] else 1)


if __name__ == "__main__":
    main()
