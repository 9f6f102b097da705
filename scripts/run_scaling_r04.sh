#!/bin/bash
# Round-4 recorded scaling runs: three consecutive full-protocol runs of
# scripts/scaling_bench.py (pinned cpusets, 96M URLs, interleaved paired
# trials, contamination gates).  Run inside tmux on an otherwise-idle
# machine — each run is ~45-80 min depending on retries.
set -u
cd "$(dirname "$0")/.."
mkdir -p bench_runs
for i in 1 2 3; do
  out="bench_runs/scaling_r04_run${i}.json"
  log="bench_runs/scaling_r04_run${i}.log"
  echo "=== run ${i} start $(date -u +%FT%TZ) ===" | tee -a "$log"
  # write to a temp file first so a killed run never leaves a 0-byte
  # "recorded" file (the round-3 failure mode)
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
