#!/bin/bash
# Poll the ambient single-thread memcpy bandwidth channel (the same
# environmental gate the scaling protocol uses) and launch weak-scaling
# run 2 only once the host leaves the degraded window observed at
# 2026-08-18T21:43Z (5.9 GB/s vs the 10.4-11.1 GB/s of every recorded
# run).  This gates on ENVIRONMENT, pre-execution — never on results.
set -u
cd "$(dirname "$0")/.."
log="bench_runs/weak_scaling_r05_run2.log"
for i in $(seq 1 36); do
  bw=$(python3 - <<'EOF'
import time
import numpy as np
a = np.ones(200_000_000, dtype=np.uint8)
best = 0.0
for _ in range(5):
    t0 = time.perf_counter(); b = a.copy(); dt = time.perf_counter() - t0
    best = max(best, a.nbytes * 2 / dt / 1e9)
print(f"{best:.2f}")
EOF
)
  echo "bw poll $i: ${bw} GB/s $(date -u +%FT%TZ)" | tee -a "$log"
  if python3 -c "import sys; sys.exit(0 if float('${bw}') >= 9.0 else 1)"; then
    echo "clean window detected, launching run 2" | tee -a "$log"
    exec bash scripts/run_weak_scaling_r05_run2.sh
  fi
  sleep 600
done
echo "WEAK RUN2 NOT LAUNCHED: no clean window in 6h $(date -u +%FT%TZ)" | tee -a "$log"
