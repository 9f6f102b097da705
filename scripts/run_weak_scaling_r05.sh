#!/bin/bash
# Round-5 weak-scaling evidence run (complementary to the closed
# strong-scaling aggregation; see scripts/weak_scaling_bench.py docstring).
# Same writer discipline: temp file then rename, never a 0-byte artifact.
set -u
cd "$(dirname "$0")/.."
mkdir -p bench_runs
out="bench_runs/weak_scaling_r05.json"
log="bench_runs/weak_scaling_r05.log"
echo "=== weak-scaling run start $(date -u +%FT%TZ) ===" | tee -a "$log"
if python scripts/weak_scaling_bench.py >"${out}.tmp" 2>>"$log"; then
  tail -n 1 "${out}.tmp" > "$out"
  rm -f "${out}.tmp"
  echo "=== weak-scaling run done $(date -u +%FT%TZ) ===" | tee -a "$log"
else
  echo "=== weak-scaling run FAILED $(date -u +%FT%TZ) ===" | tee -a "$log"
  mv "${out}.tmp" "${out}.failed" 2>/dev/null
fi
echo "WEAK RUN COMPLETE $(date -u +%FT%TZ)"
