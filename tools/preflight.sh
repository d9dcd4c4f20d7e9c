#!/usr/bin/env bash
# End-of-round gate (VERDICT r4 #6): never ship a HEAD that doesn't
# compile + verify + pass tests. Run before every end-of-round snapshot:
#   bash tools/preflight.sh
# Exit 0 = safe to snapshot; anything else = fix before committing.
set -euo pipefail
cd "$(dirname "$0")/.."

SF="${PREFLIGHT_SF:-/root/testdata/sf0.001}"
OUT="${PREFLIGHT_OUT:-/tmp/preflight_verify}"

echo "== preflight: compile =="
sbt -batch compile

echo "== preflight: Verify dump @ $SF =="
rm -rf "$OUT"
sbt -batch "runMain graft.Verify $SF $OUT"

echo "== preflight: oracle check =="
python3 tools/check.py "$SF" "$OUT"

echo "== preflight: oracle timezone-independence =="
python3 tools/tzcheck.py "$SF" "$OUT" | tail -1

echo "== preflight: sbt test =="
sbt -batch test

echo "== preflight: ALL GREEN =="
