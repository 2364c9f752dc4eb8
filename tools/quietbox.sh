#!/usr/bin/env bash
# Committed quiet-box methodology (r11 VERDICT #7): the round-over-round
# comparable stat is NOT one driver bench run (this box throttles
# sustained CPU in multi-second hypervisor windows) but the per-query
# MINIMUM merged across several full Bench runs. This script replaces
# the per-round hand process: it runs graft.Bench RUNS times
# back-to-back and merges the per-query minima into one artifact via
# tools/merge_quietbox.py (spread gates included — a query whose
# best-two observations spread > 1.3x is flagged, not booked).
#
# Usage: tools/quietbox.sh [RUNS] [OUTFILE] [SF_DIR]
set -euo pipefail
RUNS="${1:-3}"
OUT="${2:-BENCH_quietbox.json}"
SF="${3:-/root/testdata/sf0.1}"
TMP="$(mktemp /tmp/quietbox_runs.XXXXXX.jsonl)"
for i in $(seq "$RUNS"); do
  echo "[quietbox] run $i/$RUNS" >&2
  SPARK_GRAFT_SF_DIR="$SF" SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-32}" \
    sbt -batch "runMain graft.Bench" 2>/dev/null \
    | grep -m1 '^{"metric"' >> "$TMP"
done
python3 "$(dirname "$0")/merge_quietbox.py" "$TMP" "$OUT"
rm -f "$TMP"
echo "[quietbox] wrote $OUT" >&2
