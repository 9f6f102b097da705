#!/bin/bash
# Round-5 POST-CHANGE confirmation scaling run (single run, outside the
# pre-registered round-4 three-run set — that aggregation is closed and
# PASSed on runs 1-3; see BASELINE.md).  Round 5 touched plans/crawl.py
# (retract() now writes a wave_metrics lifecycle row; the wave path only
# gained a constant `retracted: 0` metrics field), so this run confirms the
# recorded efficiency still holds on the shipped binary.  Same protocol,
# same input, same writer discipline (temp file then rename).
set -u
cd "$(dirname "$0")/.."
mkdir -p bench_runs
out="bench_runs/scaling_r05_confirm.json"
log="bench_runs/scaling_r05_confirm.log"
echo "=== r05 confirm run start $(date -u +%FT%TZ) ===" | tee -a "$log"
if python scripts/scaling_bench.py >"${out}.tmp" 2>>"$log"; then
  tail -n 1 "${out}.tmp" > "$out"
  rm -f "${out}.tmp"
  echo "=== r05 confirm run done $(date -u +%FT%TZ) ===" | tee -a "$log"
else
  echo "=== r05 confirm run FAILED $(date -u +%FT%TZ) ===" | tee -a "$log"
  mv "${out}.tmp" "${out}.failed" 2>/dev/null
fi
echo "CONFIRM RUN COMPLETE $(date -u +%FT%TZ)"
