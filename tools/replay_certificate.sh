#!/usr/bin/env bash
# One-command replay of the banked differential-fuzz certificate
# (tools/certificate_manifest.json): Spark side via graft.tools.Replay
# (one sbt invocation, one shared session), then the DuckDB compare per
# sweep via tools/local_check.py. Exits non-zero on any spark-side error
# or any oracle mismatch (APPROX counts as a failure: the driver's hash
# gate would fail it).
#
# Usage: tools/replay_certificate.sh [outBase] [idFilter]
set -u
cd "$(dirname "$0")/.."
OUT="${1:-target/replay}"
FILTER="${2:-}"

sbt -batch "runMain graft.tools.Replay tools/certificate_manifest.json $OUT $FILTER" || exit 2

total_exact=0; total_bad=0; sweeps=0
for d in "$OUT"/*/; do
  id="$(basename "$d")"
  sf=$(python3 -c "
import json
for e in json.load(open('tools/certificate_manifest.json')):
    if e['id'] == '$id':
        print(e['sf']); break")
  [ -z "$sf" ] && { echo "[replay] $id: not in manifest, skipping"; continue; }
  line=$(python3 tools/local_check.py "$sf" "$d" | tail -1)
  echo "[replay] $id: $line"
  exact=$(sed -E 's/.*exact=([0-9]+).*/\1/' <<<"$line")
  approx=$(sed -E 's/.*approx=([0-9]+).*/\1/' <<<"$line")
  fail=$(sed -E 's/.*fail=([0-9]+).*/\1/' <<<"$line")
  total_exact=$((total_exact + exact))
  total_bad=$((total_bad + approx + fail))
  sweeps=$((sweeps + 1))
done
echo "[replay] CERTIFICATE: $total_exact exact over $sweeps sweeps, $total_bad bad"
[ "$total_bad" -eq 0 ] && [ "$sweeps" -gt 0 ] || exit 1
