"""Micro-decomposition of the scaling_bench canon_write stage (diagnostic
only — not part of the judged protocol).  Runs one sub-part of the stage on
the shared 48M-URL input and prints its wall time; the caller pins the
process tree (taskset) and compares 2-core vs 8-core walls per sub-part.

Usage: taskset -c 0-1 python scripts/scale_probe.py <part> [rows]
  part in: scan | udf | jvm | write_plain | full
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from csxj_crawler_spark.functions import urls as U
from csxj_crawler_spark.session import get_spark

DATA = "/dev/shm/csxj_scale_cand_48000000.parquet"


def main() -> None:
    part = sys.argv[1]
    n_rows = int(sys.argv[2]) if len(sys.argv) > 2 else 0
    cores = len(os.sched_getaffinity(0))
    scratch = "/dev/shm"
    extra = {
        "spark.local.dir": os.path.join(scratch, "csxj_spark_local"),
        "spark.sql.files.maxPartitionBytes": str(32 * 1024 * 1024),
    }
    if os.environ.get("PROBE_ARROW_BATCH"):
        extra["spark.sql.execution.arrow.maxRecordsPerBatch"] = os.environ[
            "PROBE_ARROW_BATCH"
        ]
    if os.environ.get("PROBE_NO_AQE"):
        extra["spark.sql.adaptive.enabled"] = "false"
    spark = get_spark(
        app=f"probe-{part}-{cores}", master=f"local[{cores}]",
        shuffle_partitions=4 * cores, extra=extra,
    )
    cand = spark.read.parquet(DATA)
    if n_rows:
        cand = cand.limit(n_rows)
    cand.count()  # warm listing
    # pre-fork python workers
    warm = cand.limit(4 * cores * 1000).repartition(4 * cores)
    warm.select(U.canonicalize_udf(F.col("url"))).agg(F.count("*")).collect()

    out = os.path.join(scratch, f"csxj_probe_{os.getpid()}.parquet")
    t0 = time.time()
    if part == "scan":
        n = cand.agg(F.count("url")).collect()[0][0]
    elif part == "udf":
        n = cand.select(U.canonicalize_udf(F.col("url")).alias("u")).agg(
            F.count(F.length("u"))
        ).collect()[0][0]
    elif part == "jvm":
        c = cand.withColumn("url_hash", U.url_hash(F.col("url"))).withColumn(
            "host", U.host_of(F.col("url"))
        )
        c = c.withColumn("host_bucket", U.host_bucket(F.col("host"), 64)).withColumn(
            "salt", U.url_salt(F.col("url"))
        )
        n = c.agg(
            F.count("url"), F.max("url_hash"), F.count("host"), F.max("salt")
        ).collect()[0][0]
    elif part == "udf_write":
        cand.withColumn("url", U.canonicalize_udf(F.col("url"))).write.mode(
            "overwrite"
        ).parquet(out)
        n = -1
    elif part == "udf_jvm":
        c = (
            cand.withColumn("url", U.canonicalize_udf(F.col("url")))
            .withColumn("url_hash", U.url_hash(F.col("url")))
            .withColumn("host", U.host_of(F.col("url")))
            .withColumn("host_bucket", U.host_bucket(F.col("host"), 64))
            .withColumn("salt", U.url_salt(F.col("url")))
        )
        n = c.agg(F.count("url"), F.max("url_hash"), F.max("salt")).collect()[0][0]
    elif part == "jvm_full":
        (
            cand.withColumn("url", U.canonicalize_expr(F.col("url")))
            .withColumn("url_hash", U.url_hash(F.col("url")))
            .withColumn("host", U.host_of(F.col("url")))
            .withColumn("host_bucket", U.host_bucket(F.col("host"), 64))
            .withColumn("salt", U.url_salt(F.col("url")))
        ).write.mode("overwrite").parquet(out)
        n = -1
    elif part == "write_plain":
        cand.write.mode("overwrite").parquet(out)
        n = -1
    elif part == "full":
        (
            cand.withColumn("url", U.canonicalize_udf(F.col("url")))
            .withColumn("url_hash", U.url_hash(F.col("url")))
            .withColumn("host", U.host_of(F.col("url")))
            .withColumn("host_bucket", U.host_bucket(F.col("host"), 64))
            .withColumn("salt", U.url_salt(F.col("url")))
        ).write.mode("overwrite").parquet(out)
        n = -1
    else:
        raise SystemExit(f"unknown part {part}")
    dt = time.time() - t0
    with open("/proc/stat") as f:
        pass
    print(f"PROBE {part} cores={cores} sec={dt:.2f} n={n}")
    spark.stop()
    import shutil

    shutil.rmtree(out, ignore_errors=True)


if __name__ == "__main__":
    main()
