"""WEAK-scaling evidence, complementary to scripts/scaling_bench.py.

The judged north_rule is STRONG scaling (same input, N vs 4N cores;
closed by the pre-registered three-run aggregation in BASELINE.md).  This
script measures the complementary question a 100-TB deployment actually
asks — *does per-core throughput hold when the cluster AND the data grow
together?* — by running the same frontier-dedup mega-wave at

    2 cores / 24M URLs   vs   8 cores / 96M URLs

(4x cores, 4x input; ideal = identical wall time, weak-scaling efficiency
= per-core-throughput ratio = sec_small / sec_large).

Why this is informative here: the strong-scaling residual on this
one-socket VM is dominated by (a) a fixed serial component (~25 s of
driver scheduling / broadcast builds / commits, measured in BASELINE.md)
that the fixed-size input cannot amortize at 4N, and (b) ambient
LLC/memory-bus weather that moves the two legs' walls by +-10% between
runs.  Scaling the input with the cores amortizes (a) identically at both
levels, which isolates the quantity that matters at 10^10-URL waves:
whether the *scalable* work itself runs at constant per-core rate.

Every leg is executed through scripts/scaling_bench.py's own child mode
("--cores N" + SPARK_GRAFT_SCALE_URLS), so the full measured protocol is
inherited verbatim: taskset cpuset of exactly N cores, OMP/BLAS=1
workers, tmpfs input+scratch, 32 MB maxPartitionBytes, 16k Arrow batches,
v2 committer, full-pipeline untimed warm-up, per-trial cpuset-local
steal telemetry.  The orchestrator adds the same ambient-bandwidth
sampler (imported from scaling_bench), the same steal/bandwidth gates
with bounded interleaved retries, the same alternating pair order, and
the same median-over-clean-pairs headline.  One JSON line on stdout.

This is EVIDENCE ALONGSIDE, not a replacement: the pre-registered
strong-scaling rule and its PASS are recorded in BASELINE.md and are not
affected by anything this script prints.
"""
from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _HERE)

import scaling_bench as SB  # noqa: E402  (reuses _BwSampler; no side effects)

BENCH = os.path.join(_HERE, "scaling_bench.py")

# (cores, urls) per level — 4x cores, 4x input by default.
SMALL = (
    int(os.environ.get("SPARK_GRAFT_WEAK_SMALL_CORES", "2")),
    int(os.environ.get("SPARK_GRAFT_WEAK_SMALL_URLS", "24000000")),
)
LARGE = (
    int(os.environ.get("SPARK_GRAFT_WEAK_LARGE_CORES", "8")),
    int(os.environ.get("SPARK_GRAFT_WEAK_LARGE_URLS", "96000000")),
)
TRIALS = int(os.environ.get("SPARK_GRAFT_WEAK_TRIALS", "3"))
MAX_EXTRA = int(os.environ.get("SPARK_GRAFT_WEAK_MAX_EXTRA", "2"))
STEAL_BAD = float(os.environ.get("SPARK_GRAFT_SCALE_STEAL_PCT", "2.0"))
BW_FRAC = float(os.environ.get("SPARK_GRAFT_SCALE_BW_FRAC", "0.85"))


def _leg_env(urls: int) -> dict:
    return dict(
        os.environ,
        SPARK_GRAFT_SCALE_URLS=str(urls),
        OMP_NUM_THREADS="1",
        OPENBLAS_NUM_THREADS="1",
        MKL_NUM_THREADS="1",
        NUMEXPR_NUM_THREADS="1",
    )


def _pregenerate() -> None:
    """Build both candidate inputs unpinned, before any timed leg (the
    child would otherwise generate a missing input under its 2-core
    cpuset — untimed either way, but slow and bandwidth-noisy)."""
    for _, urls in (SMALL, LARGE):
        subprocess.run(
            [sys.executable, "-c",
             "import sys; sys.path.insert(0, %r); "
             "import scaling_bench as S; S._gen_candidates()" % _HERE],
            env=_leg_env(urls),
            check=True,
            preexec_fn=lambda: os.sched_setaffinity(
                0, set(range(os.cpu_count() or 32))
            ),
        )


def _run_leg(cores: int, urls: int, sampler: "SB._BwSampler") -> dict:
    cmd = [
        "taskset", "-c", f"0-{cores - 1}",
        sys.executable, BENCH, "--cores", str(cores),
    ]
    proc = subprocess.Popen(
        cmd, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
        text=True, env=_leg_env(urls),
    )
    bw: list[float] = []
    while proc.poll() is None:
        time.sleep(6)
        bw.append(sampler.sample())
    out, err = proc.communicate()
    if proc.returncode != 0:
        raise RuntimeError(f"leg {cores}c/{urls} failed:\n{err[-2000:]}")
    line = [l for l in out.splitlines() if l.startswith("RESULT ")][-1]
    rec = json.loads(line[len("RESULT "):])
    bw_s = sorted(bw)
    rec["bw_gbps_median"] = bw_s[len(bw_s) // 2] if bw_s else None
    rec["urls"] = urls
    rec["urls_per_sec"] = round(urls / rec["sec"], 1)
    rec["per_core_urls_per_sec"] = round(urls / rec["sec"] / cores, 1)
    return rec


def main() -> None:
    _pregenerate()
    n_host = os.cpu_count() or 32
    try:
        # keep the orchestrator + bw sampler off the trial cpusets
        os.sched_setaffinity(0, {n_host - 2, n_host - 1})
    except OSError:
        pass
    sampler = SB._BwSampler()
    small_trials: list[dict] = []
    large_trials: list[dict] = []

    def _one_pair(reverse: bool) -> None:
        order = (LARGE, SMALL) if reverse else (SMALL, LARGE)
        for cores, urls in order:
            rec = _run_leg(cores, urls, sampler)
            (small_trials if (cores, urls) == SMALL else large_trials).append(rec)

    def _bw_ok(t: dict) -> bool:
        best = max(
            (r["bw_gbps_median"] or 0.0) for r in small_trials + large_trials
        )
        return t["bw_gbps_median"] is None or best == 0.0 or (
            t["bw_gbps_median"] >= BW_FRAC * best
        )

    def _clean(t: dict) -> bool:
        return t.get("steal_pct", 0.0) <= STEAL_BAD and _bw_ok(t)

    for i in range(TRIALS):
        _one_pair(reverse=bool(i % 2))
    for j in range(MAX_EXTRA):
        if all(_clean(t) for t in small_trials + large_trials):
            break
        _one_pair(reverse=bool((TRIALS + j) % 2))

    n_pairs = min(len(small_trials), len(large_trials))
    # weak-scaling efficiency per interleaved pair: ratio of per-core
    # throughputs (== sec_small / sec_large when urls scale with cores)
    pair_effs = [
        round(
            large_trials[i]["per_core_urls_per_sec"]
            / small_trials[i]["per_core_urls_per_sec"],
            3,
        )
        for i in range(n_pairs)
    ]
    clean_pair_effs = [
        pair_effs[i]
        for i in range(n_pairs)
        if _clean(small_trials[i]) and _clean(large_trials[i])
    ]
    pool = clean_pair_effs if len(clean_pair_effs) >= 2 else pair_effs
    eff = sorted(pool)[len(pool) // 2]
    med_small = statistics.median(t["per_core_urls_per_sec"] for t in small_trials)
    med_large = statistics.median(t["per_core_urls_per_sec"] for t in large_trials)
    print(
        json.dumps(
            {
                "metric": (
                    "WEAK scaling: per-core frontier throughput, "
                    f"{SMALL[0]}c/{SMALL[1]//10**6}M vs "
                    f"{LARGE[0]}c/{LARGE[1]//10**6}M URLs "
                    "(median over interleaved clean pairs; complementary "
                    "evidence — the judged strong-scaling rule is closed "
                    "separately in BASELINE.md)"
                ),
                "small": {
                    "cores": SMALL[0], "urls": SMALL[1],
                    "median_per_core_urls_per_sec": med_small,
                    "trials": small_trials,
                },
                "large": {
                    "cores": LARGE[0], "urls": LARGE[1],
                    "median_per_core_urls_per_sec": med_large,
                    "trials": large_trials,
                },
                "weak_scaling_efficiency": round(eff, 3),
                "pair_efficiencies": pair_effs,
                "clean_pair_efficiencies": clean_pair_effs,
                "weak_scaling_efficiency_level_median": round(
                    med_large / med_small, 3
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
