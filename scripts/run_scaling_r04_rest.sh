#!/bin/bash
# Resume the round-4 recorded scaling runs: runs 2 and 3 only (run 1
# completed and is recorded; the original loop was killed right after
# starting run 2 — its 0-byte temp file was removed, no recorded file
# was ever corrupted thanks to the write-temp-then-rename protocol).
set -u
cd "$(dirname "$0")/.."
mkdir -p bench_runs
for i in 2 3; do
  out="bench_runs/scaling_r04_run${i}.json"
  log="bench_runs/scaling_r04_run${i}.log"
  echo "=== run ${i} start $(date -u +%FT%TZ) ===" | tee -a "$log"
  if python scripts/scaling_bench.py >"${out}.tmp" 2>>"$log"; then
    tail -n 1 "${out}.tmp" > "$out"
    rm -f "${out}.tmp"
    echo "=== run ${i} done $(date -u +%FT%TZ) ===" | tee -a "$log"
  else
    echo "=== run ${i} FAILED $(date -u +%FT%TZ) ===" | tee -a "$log"
    mv "${out}.tmp" "${out}.failed" 2>/dev/null
  fi
done
echo "ALL RUNS COMPLETE $(date -u +%FT%TZ)"
