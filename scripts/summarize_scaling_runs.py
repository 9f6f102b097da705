"""Summarize the recorded round-4 scaling runs per the PRE-REGISTERED
aggregation (BASELINE.md, committed before runs 2-3 finished): headline =
median across runs of each metric; the judged claim requires BOTH the
median paired efficiency AND the median level-median to be >= 0.80.

Usage: python scripts/summarize_scaling_runs.py [glob...]
Defaults to bench_runs/scaling_r04_run{1,2,3}.json.
"""
from __future__ import annotations

import glob
import json
import statistics
import sys


def main() -> int:
    paths = sys.argv[1:] or sorted(glob.glob("bench_runs/scaling_r04_run[123].json"))
    runs = []
    for p in paths:
        with open(p) as f:
            d = json.loads(f.read().strip().splitlines()[-1])
        runs.append((p, d))
        print(
            f"{p}: paired={d['scaling_efficiency']:.3f} "
            f"level_median={d['scaling_efficiency_level_median']:.3f} "
            f"best_of={d['scaling_efficiency_best_of']:.3f} "
            f"clean_pairs={d.get('clean_pair_efficiencies')} pass={d['pass']}"
        )
    if not runs:
        print("no run files found", file=sys.stderr)
        return 2
    med = lambda k: statistics.median(d[k] for _, d in runs)
    paired = med("scaling_efficiency")
    level = med("scaling_efficiency_level_median")
    best = med("scaling_efficiency_best_of")
    ok = paired >= 0.8 and level >= 0.8
    print(
        f"MEDIANS over {len(runs)} runs: paired={paired:.3f} "
        f"level_median={level:.3f} best_of={best:.3f} -> "
        f"{'PASS' if ok else 'FAIL'} (pre-registered rule: both >= 0.80)"
    )
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
