"""Checkpoint-resume (BASELINE.json:14, SURVEY.md §5.2.6): kill after wave k,
re-open the snapshot store with a FRESH engine, finish — outputs identical to
an uninterrupted run."""

from __future__ import annotations

import pytest

from csxj_crawler_spark.plans.crawl import CrawlEngine
from csxj_crawler_spark.sources.snapshot import SnapshotStore


@pytest.fixture(scope="module")
def inputs(spark, fix_dir):
    return (
        spark.read.parquet(f"{fix_dir}/seeds.parquet"),
        spark.read.parquet(f"{fix_dir}/web_graph.parquet"),
        spark.read.parquet(f"{fix_dir}/robots.parquet"),
    )


def _order(eng):
    return [
        (r.seq, r.url, r.wave, r.status, r.fetch_ts)
        for r in eng.crawl_order().collect()
    ]


def test_resume_identical(spark, inputs, tmp_path_factory):
    seeds, graph, robots = inputs

    full_store = SnapshotStore(str(tmp_path_factory.mktemp("full")))
    full = CrawlEngine(spark, full_store, n_buckets=8)
    full.run(seeds, graph, robots)
    want = _order(full)
    assert len(want) > 0

    part_store = SnapshotStore(str(tmp_path_factory.mktemp("part")))
    CrawlEngine(spark, part_store, n_buckets=8).run(
        seeds, graph, robots, max_waves=2
    )  # "crash" after wave 1: engine object discarded, store survives
    resumed = CrawlEngine(spark, part_store, n_buckets=8)
    resumed.run(seeds, graph, robots)  # must skip bootstrap, continue at wave 2
    assert _order(resumed) == want

    ours = resumed.seen_set().select("url")
    theirs = full.seen_set().select("url")
    assert ours.exceptAll(theirs).count() == 0
    assert theirs.exceptAll(ours).count() == 0


def test_rerun_completed_store_is_noop(spark, inputs, tmp_path_factory):
    seeds, graph, robots = inputs
    store = SnapshotStore(str(tmp_path_factory.mktemp("noop")))
    eng = CrawlEngine(spark, store, n_buckets=8)
    eng.run(seeds, graph, robots)
    want = _order(eng)
    v_before = store.current_version("fetch_log")
    stats = eng.run(seeds, graph, robots)  # frontier empty -> immediate stop
    assert [s for s in stats if s.fetched or s.errors] == []
    assert _order(eng) == want
    assert store.current_version("fetch_log") == v_before
