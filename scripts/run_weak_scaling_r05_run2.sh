#!/bin/bash
# Round-5 weak-scaling run 2 of 2 — PRE-REGISTERED before execution:
# the reported weak-scaling summary in BASELINE.md is the per-metric
# median over BOTH runs' clean-pair medians, recorded regardless of
# outcome (same no-shopping discipline as the strong-scaling
# three-run aggregation in scripts/summarize_scaling_runs.py).
# Same writer discipline: temp file then rename, never a 0-byte artifact.
set -u
cd "$(dirname "$0")/.."
mkdir -p bench_runs
out="bench_runs/weak_scaling_r05_run2.json"
log="bench_runs/weak_scaling_r05_run2.log"
echo "=== weak-scaling run2 start $(date -u +%FT%TZ) ===" | tee -a "$log"
if python scripts/weak_scaling_bench.py >"${out}.tmp" 2>>"$log"; then
  tail -n 1 "${out}.tmp" > "$out"
  rm -f "${out}.tmp"
  echo "=== weak-scaling run2 done $(date -u +%FT%TZ) ===" | tee -a "$log"
else
  echo "=== weak-scaling run2 FAILED $(date -u +%FT%TZ) ===" | tee -a "$log"
  mv "${out}.tmp" "${out}.failed" 2>/dev/null
fi
echo "WEAK RUN2 COMPLETE $(date -u +%FT%TZ)"
