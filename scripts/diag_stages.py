"""Per-stage scaling diagnosis for the frontier mega-wave (not the judged
number — forcing stage boundaries changes caching slightly; use
scripts/scaling_bench.py for the recorded end-to-end evidence).

Usage: [taskset -c 0-N] python scripts/diag_stages.py --cores N [--urls M]
Prints one JSON line with per-stage seconds.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import scripts.scaling_bench as sb


def main() -> None:
    cores = int(sys.argv[sys.argv.index("--cores") + 1])
    sb._gen_candidates()

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from csxj_crawler_spark import spec
    from csxj_crawler_spark.functions import urls as U
    from csxj_crawler_spark.operators import membership as M
    from csxj_crawler_spark.session import get_spark

    n_buckets = 64
    spark = get_spark(
        app=f"diag-{cores}", master=f"local[{cores}]",
        shuffle_partitions=4 * cores,
        extra={"spark.local.dir": os.path.join(sb._SCRATCH, "csxj_spark_local")},
    )
    cand = spark.read.parquet(sb.DATA)
    cand.count()
    warm = cand.limit(4 * cores * 1000).repartition(4 * cores)
    warm.select(U.canonicalize_udf(F.col("url"))).agg(F.count("*")).collect()

    stages: dict[str, float] = {}
    t = time.time()

    def lap(name: str) -> None:
        nonlocal t
        stages[name] = round(time.time() - t, 2)
        t = time.time()

    canon_pq = os.path.join(sb._SCRATCH, f"csxj_diag_canon_{os.getpid()}.parquet")
    (
        cand.withColumn("url", U.canonicalize_udf(F.col("url")))
        .withColumn("url_hash", U.url_hash(F.col("url")))
        .withColumn("host", U.host_of(F.col("url")))
        .withColumn("host_bucket", U.host_bucket(F.col("host"), n_buckets))
        .withColumn("salt", U.url_salt(F.col("url")))
    ).write.mode("overwrite").parquet(canon_pq)
    c = spark.read.parquet(canon_pq)
    lap("canon_persist")
    seen = c.filter(F.pmod(F.col("cand_seq"), F.lit(2)) == 0).select(
        "host_bucket", "url_hash", "url"
    )
    blooms = M.build_blooms(seen, salt=spec.BLOOM_SALT).cache()
    blooms.count()
    lap("bloom_build")
    cands = c.filter(F.pmod(F.col("cand_seq"), F.lit(2)) == 1)
    maybe_h = M.bloom_probe_maybe(cands, blooms, salt=spec.BLOOM_SALT).cache()
    maybe_h.count()
    lap("bloom_probe")
    matches = seen.join(
        F.broadcast(maybe_h), ["host_bucket", "url_hash"], "left_semi"
    ).select("url_hash", "url")
    new = cands.join(F.broadcast(matches), ["url_hash", "url"], "left_anti")
    budget_c = F.greatest(
        F.lit(1),
        F.floor(F.lit(spec.WAVE_SECONDS) / F.col("crawl_delay")).cast("int"),
    )
    narrow = new.select("host", "url_hash", "cand_seq", "crawl_delay", "salt")
    order = (F.asc("cand_seq"),)
    per_salt = Window.partitionBy("host", "salt").orderBy(*order)
    per_host = Window.partitionBy("host").orderBy(*order)
    sel_keys = (
        narrow.withColumn("salt_rank", F.row_number().over(per_salt))
        .filter(F.col("salt_rank") <= budget_c)
        .withColumn("host_rank", F.row_number().over(per_host))
        .filter(F.col("host_rank") <= budget_c)
    )
    wsel = Window.orderBy("cand_seq")
    picked_keys = (
        sel_keys.withColumn("wave_rank", F.row_number().over(wsel))
        .filter(F.col("wave_rank") <= 1_000_000)
        .select("url_hash", "cand_seq", "wave_rank")
    )
    picked = cand_final = None
    picked = cands.join(F.broadcast(picked_keys), ["url_hash", "cand_seq"])
    n_sel = picked.count()
    lap("dedup_window_pick")
    stages["total"] = round(sum(stages.values()), 2)
    print("DIAG " + json.dumps({"cores": cores, "selected": n_sel, **stages}))
    spark.stop()
    import shutil

    shutil.rmtree(canon_pq, ignore_errors=True)


if __name__ == "__main__":
    main()
