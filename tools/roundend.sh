#!/bin/bash
# Round-end local gate (r16 verdict #6): the full contract swept at BOTH
# scale factors (the driver's sf0.01 gate dir plus the cheap sf0.001
# sweep that exercises every SF-coupled fixture — store builds, JDBC
# stride bounds, watermark calibrations), each recorded as a committed
# snapshot JSON, followed by the per-key perf-drift gate against the
# prior round's bench record.
#
# Failure discipline (r17 review): the output dir is wiped BEFORE each
# sweep and sbt's exit code is checked directly — a Verify crash can
# never leave a previous run's parquet in place for selfcheck to
# certify as green.
#
# Usage: tools/roundend.sh [prior BENCH_FULL record]   (default: r16's)
set -eo pipefail
cd "$(dirname "$0")/.."
PRIOR="${1:-BENCH_FULL_r18_builder.json}"
for SF in 0.01 0.001; do
  OUT="/tmp/roundend_sf$SF"
  rm -rf "$OUT"
  LOG=$(mktemp)
  if ! SPARK_GRAFT_CPUS=8 sbt -batch "runMain graft.Verify /root/testdata/sf$SF $OUT" >"$LOG" 2>&1; then
    tail -30 "$LOG"; echo "FATAL: Verify crashed at sf$SF"; exit 1
  fi
  if grep -E '\[verify\]' "$LOG"; then
    echo "FATAL: keys threw at sf$SF (lines above)"; exit 1
  fi
  rm -f "$LOG"
  python3 tools/selfcheck.py "/root/testdata/sf$SF" "$OUT" --json "tools/roundend_sf$SF.json"
done
python3 tools/selfcheck.py --perf BENCH_FULL.json "$PRIOR"
echo "roundend: both-SF snapshots written to tools/roundend_sf{0.01,0.001}.json"
