"""Structured Streaming façade tests (SURVEY.md §2.9): the streamed crawl
reproduces the batch engine's exact outputs, seed injection is ordered and
idempotent, and the stateful politeness monitor carries state across
micro-batches."""

from __future__ import annotations

import glob
import os
import shutil

import pytest
from pyspark.sql import functions as F

from csxj_crawler_spark.plans.crawl import CrawlEngine
from csxj_crawler_spark.sources.snapshot import SnapshotStore
from csxj_crawler_spark.streaming import facade


def _order(eng):
    return [(r.seq, r.url, r.wave, r.status) for r in eng.crawl_order().collect()]


def test_streaming_crawl_matches_batch(spark, fix_dir, tmp_path_factory):
    """One seed drop through the stream ≡ the batch engine run (and ≡ the
    golden simulator, by transitivity with test_crawl_golden)."""
    base = tmp_path_factory.mktemp("stream")
    seeds_dir = str(base / "seeds_in")
    os.makedirs(seeds_dir)
    shutil.copy(
        glob.glob(f"{fix_dir}/seeds.parquet")[0]
        if os.path.isfile(f"{fix_dir}/seeds.parquet")
        else f"{fix_dir}/seeds.parquet",
        os.path.join(seeds_dir, "batch0.parquet"),
    )
    graph = spark.read.parquet(f"{fix_dir}/web_graph.parquet")
    robots = spark.read.parquet(f"{fix_dir}/robots.parquet")

    stream_store = SnapshotStore(str(base / "stream_store"))
    facade.run_streaming_crawl(
        spark, stream_store, seeds_dir, graph, robots,
        checkpoint_dir=str(base / "ckpt"),
        engine_kwargs={"n_buckets": 8},
    )
    batch_store = SnapshotStore(str(base / "batch_store"))
    batch_eng = CrawlEngine(spark, batch_store, n_buckets=8)
    batch_eng.run(spark.read.parquet(f"{fix_dir}/seeds.parquet"), graph, robots)

    stream_eng = CrawlEngine(spark, stream_store, n_buckets=8)
    assert _order(stream_eng) == _order(batch_eng)


def test_inject_seeds_dedup_and_order(spark, fix_dir, tmp_path_factory):
    store = SnapshotStore(str(tmp_path_factory.mktemp("inject")))
    eng = CrawlEngine(spark, store, n_buckets=8)
    seeds = spark.read.parquet(f"{fix_dir}/seeds.parquet")
    graph = spark.read.parquet(f"{fix_dir}/web_graph.parquet")
    robots = spark.read.parquet(f"{fix_dir}/robots.parquet")
    eng.run(seeds, graph, robots, max_waves=2)
    seen_before = eng.seen_set().count()

    # re-injecting already-seen seeds is a no-op (idempotent replay)
    assert eng.inject_seeds(seeds) == 0
    assert eng.seen_set().count() == seen_before

    # injecting genuinely new URLs enqueues them BEHIND existing frontier
    min_q = eng.store.read(spark, "queued")
    max_seq_before = min_q.agg(F.max("discovered_seq")).collect()[0][0]
    fresh = spark.createDataFrame(
        [("http://lesoir-0.example/late/tick-1", "lesoir", 1.0, 0),
         ("http://lesoir-0.example/late/tick-2", "lesoir", 1.0, 1)],
        "url string, source string, priority double, seed_rank long",
    )
    assert eng.inject_seeds(fresh) == 2
    q = eng.store.read(spark, "queued").filter(F.col("url").contains("/late/"))
    rows = sorted((r.url, r.discovered_seq) for r in q.collect())
    assert len(rows) == 2
    assert rows[0][1] > max_seq_before and rows[1][1] == rows[0][1] + 1
    # crawl continues and eventually fetches them without disturbing parity
    eng.run(seeds, graph, robots)
    fetched = {r.url for r in eng.crawl_order().collect()}
    assert "http://lesoir-0.example/late/tick-1" in fetched


def test_politeness_violation_monitor(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("polstream")
    src = str(base / "in")
    os.makedirs(src)
    rows = [
        ("h1.example", 0, 100.0, 2.0),
        ("h1.example", 1, 102.0, 2.0),   # ok: gap 2.0
        ("h1.example", 2, 103.0, 2.0),   # VIOLATION: gap 1.0
        ("h2.example", 3, 100.0, 5.0),
        ("h2.example", 4, 104.0, 5.0),   # VIOLATION: gap 4.0
    ]
    spark.createDataFrame(
        rows, "host string, seq long, fetch_ts double, crawl_delay double"
    ).coalesce(1).write.parquet(src, mode="append")
    stream = (
        spark.readStream.schema("host string, seq long, fetch_ts double, crawl_delay double")
        .parquet(src)
    )
    out = facade.politeness_violations(stream)
    q = (
        out.writeStream.format("memory").queryName("viols")
        .option("checkpointLocation", str(base / "ckpt"))
        .trigger(availableNow=True)
        .outputMode("append")
        .start()
    )
    q.awaitTermination()
    got = {(r.host, r.seq) for r in spark.sql("SELECT * FROM viols").collect()}
    assert got == {("h1.example", 2), ("h2.example", 4)}


def test_windowed_fetch_metrics(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("winstream")
    src = str(base / "in")
    os.makedirs(src)
    rows = [
        ("h1", 200, 1_700_000_001.0),
        ("h1", 200, 1_700_000_004.0),
        ("h1", 404, 1_700_000_011.0),
        # sentinel far in the future: advances the watermark past the
        # earlier windows so append mode emits them (late data beyond the
        # 30s watermark would be dropped from metrics, never from ordering)
        ("zz", 200, 1_700_000_100.0),
    ]
    spark.createDataFrame(rows, "host string, status int, ts double").withColumn(
        "event_ts", F.timestamp_seconds("ts")
    ).coalesce(1).write.parquet(src, mode="append")
    stream = (
        spark.readStream.schema("host string, status int, ts double, event_ts timestamp")
        .parquet(src)
    )
    out = facade.windowed_fetch_metrics(stream)
    q = (
        out.writeStream.format("memory").queryName("winm")
        .option("checkpointLocation", str(base / "ckpt"))
        .trigger(availableNow=True)
        .outputMode("append")
        .start()
    )
    q.awaitTermination()
    got = {
        (r.host, r.fetches, r.ok, r.errors)
        for r in spark.sql("SELECT * FROM winm").collect()
    }
    assert ("h1", 2, 2, 0) in got  # first 10s window closed by the watermark
