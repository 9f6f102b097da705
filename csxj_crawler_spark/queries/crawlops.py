"""Crawl-engine operators exposed under the driver contract (SURVEY.md §2.1-
2.7 crawl rows): canonicalization (expr + Arrow-UDF variants), wave-0
frontier bootstrap, the full judged crawl (order / seen set / metrics /
robots exclusions).

Oracles are literal VALUES emitted by the pure-Python reference simulator
(``fixtures/simulator.py`` — an independent implementation: urllib parsing,
plain loops) over the same deterministic tiny fixture, so DuckDB verifies
Spark against the reference semantics without sharing any code.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from csxj_crawler_spark.fixtures import simulator
from csxj_crawler_spark.functions import urls as U
from csxj_crawler_spark.plans.crawl import CrawlEngine
from csxj_crawler_spark.queries._fixture import tiny_fixture_dir, values_sql
from csxj_crawler_spark.sources.snapshot import SnapshotStore

_sim_cache: dict[str, simulator.SimResult] = {}
_engine_cache: dict[str, CrawlEngine] = {}


def _sim() -> simulator.SimResult:
    d = tiny_fixture_dir()
    if d not in _sim_cache:
        _sim_cache[d] = simulator.simulate_dir(d)
    return _sim_cache[d]


def _engine(spark: SparkSession) -> CrawlEngine:
    d = tiny_fixture_dir()
    if d not in _engine_cache:
        store = SnapshotStore(tempfile.mkdtemp(prefix="csxj_crawl_q_"))
        eng = CrawlEngine(spark, store, n_buckets=8)
        eng.run(
            spark.read.parquet(f"{d}/seeds.parquet"),
            spark.read.parquet(f"{d}/web_graph.parquet"),
            spark.read.parquet(f"{d}/robots.parquet"),
        )
        _engine_cache[d] = eng
    return _engine_cache[d]


# --------------------------------------------------------------------------
# P1 — URL canonicalization: BOTH engine paths in one judged query.  The
# JVM-expression variant produces canon_url; the vectorized Arrow (pandas)
# UDF variant is recomputed alongside and compared bit-for-bit — the oracle
# asserts arrow_identical=TRUE on every row, so a divergence between the
# two implementations fails the hash, not just a unit test.
# --------------------------------------------------------------------------
def q_url_canonicalize(spark, sf_dir):
    d = tiny_fixture_dir()
    seeds = spark.read.parquet(f"{d}/seeds.parquet")
    return seeds.select(
        "seed_rank",
        "url",
        U.canonicalize_expr(F.col("url")).alias("canon_url"),
        (
            U.canonicalize_expr(F.col("url")) == U.canonicalize_udf(F.col("url"))
        ).alias("arrow_identical"),
    )


def _sql_url_canonicalize() -> str:
    import pyarrow.parquet as pq

    d = tiny_fixture_dir()
    rows = [
        (r["seed_rank"], r["url"], simulator.canon_py(r["url"]), True)
        for r in pq.read_table(f"{d}/seeds.parquet").to_pylist()
    ]
    return values_sql(
        [
            ("seed_rank", "BIGINT"),
            ("url", "VARCHAR"),
            ("canon_url", "VARCHAR"),
            ("arrow_identical", "BOOLEAN"),
        ],
        rows,
    )


# --------------------------------------------------------------------------
# D1/D7 — wave-0 frontier: canonicalize + dedup keep-first (set-diff seed)
# --------------------------------------------------------------------------
def q_crawl_wave0_frontier(spark, sf_dir):
    d = tiny_fixture_dir()
    seeds = spark.read.parquet(f"{d}/seeds.parquet")
    from pyspark.sql import Window

    s = seeds.select(
        U.canonicalize_expr(F.col("url")).alias("url"), "source", "seed_rank"
    )
    w = Window.partitionBy("url").orderBy("seed_rank")
    return (
        s.withColumn("rn", F.row_number().over(w))
        .filter("rn = 1")
        .select("url", "source", U.host_of(F.col("url")).alias("host"))
    )


def _sql_wave0() -> str:
    sim = _sim()
    # wave-0 queue = first len(seed dedup) items of the simulator's seen set,
    # reconstructed independently: re-run the seed phase of the simulator
    import pyarrow.parquet as pq

    d = tiny_fixture_dir()
    seen: dict[str, tuple] = {}
    for r in sorted(pq.read_table(f"{d}/seeds.parquet").to_pylist(), key=lambda x: x["seed_rank"]):
        cu = simulator.canon_py(r["url"])
        if cu not in seen:
            seen[cu] = (cu, r["source"], simulator._host_of(cu))
    return values_sql(
        [("url", "VARCHAR"), ("source", "VARCHAR"), ("host", "VARCHAR")],
        list(seen.values()),
    )


# --------------------------------------------------------------------------
# The judged invariants as oracle-checked queries
# --------------------------------------------------------------------------
def q_crawl_order(spark, sf_dir):
    eng = _engine(spark)
    return eng.crawl_order().select("seq", "url", "host", "wave", "status")


def _sql_crawl_order() -> str:
    rows = [
        (r["seq"], r["url"], r["host"], r["wave"], r["status"])
        for r in _sim().crawl_order
    ]
    return values_sql(
        [
            ("seq", "BIGINT"),
            ("url", "VARCHAR"),
            ("host", "VARCHAR"),
            ("wave", "INT"),
            ("status", "INT"),
        ],
        rows,
    )


def q_crawl_seen_set(spark, sf_dir):
    eng = _engine(spark)
    return eng.seen_set().select("url")


def _sql_crawl_seen() -> str:
    return values_sql([("url", "VARCHAR")], [(u,) for u in _sim().seen])


def q_crawl_wave_metrics(spark, sf_dir):
    eng = _engine(spark)
    return eng.wave_metrics().select(
        "wave", "urls_in", "urls_new", "fetched", "errors", "retracted"
    )


def _sql_crawl_metrics() -> str:
    # no retract() call in the judged run, so the reference simulator's
    # expectation for the round-5 `retracted` counter is 0 on every wave row
    rows = [
        (m["wave"], m["urls_in"], m["urls_new"], m["fetched"], m["errors"], 0)
        for m in _sim().wave_metrics
    ]
    return values_sql(
        [
            ("wave", "INT"),
            ("urls_in", "BIGINT"),
            ("urls_new", "BIGINT"),
            ("fetched", "BIGINT"),
            ("errors", "BIGINT"),
            ("retracted", "BIGINT"),
        ],
        rows,
    )


def q_crawl_excluded(spark, sf_dir):
    eng = _engine(spark)
    ex = eng.store.read(spark, "excluded")
    return ex.select("url").distinct()


def _sql_crawl_excluded() -> str:
    return values_sql([("url", "VARCHAR")], [(u,) for u in sorted(set(_sim().excluded))])


# --------------------------------------------------------------------------
# P5/A5 — the complete TaggedURL tag vocabulary (SURVEY.md §1.1
# [M csxj/common/tagging.py]) at per-host granularity: every outlink yields
# a SET of tags — its page position (in text / sidebar box / bottom box /
# embedded), its media kind when not a plain hyperlink (image / video /
# tweet / plaintext), "anchor" when it canonicalizes to its own page, and
# its scope (same-host / same-owner / external).  Counts per (host, tag).
# Round 5: this query FOLDS the former separate `link_tag_counts`
# (host × scope counts) into the full-vocabulary one — (host, tag) is a
# strict superset of both previous groupings (global tag counts and
# per-host scope counts are its marginals), freeing one slot of the
# 50-query driver cap for `article_extract`.
# --------------------------------------------------------------------------
def q_link_tag_counts_full(spark, sf_dir):
    d = tiny_fixture_dir()
    g = spark.read.parquet(f"{d}/web_graph.parquet")
    exploded = g.select("url", "host", F.explode("outlinks").alias("link"))
    canon = U.canonicalize_expr(F.col("link.url"))
    lhost = U.host_of(canon)
    scope = (
        F.when(lhost == F.col("host"), F.lit("same-host"))
        .when(
            F.split(lhost, "-").getItem(0) == F.split(F.col("host"), "-").getItem(0),
            F.lit("same-owner"),
        )
        .otherwise(F.lit("external"))
    )
    media = F.when(F.col("link.kind") != "text", F.col("link.kind"))
    anchor = F.when(canon == F.col("url"), F.lit("anchor"))
    tags = F.array(F.col("link.position"), scope, media, anchor)
    return (
        exploded.select(
            "host", F.explode(F.filter(tags, lambda x: x.isNotNull())).alias("tag")
        )
        .groupBy("host", "tag")
        .agg(F.count("*").alias("n_links"))
    )


def _sql_link_tags_full() -> str:
    import pyarrow.parquet as pq

    d = tiny_fixture_dir()
    counts: dict[tuple, int] = {}
    for page in pq.read_table(f"{d}/web_graph.parquet").to_pylist():
        for link in page["outlinks"] or []:
            cu = simulator.canon_py(link["url"])
            lh = simulator._host_of(cu)
            tags = [link["position"]]
            if lh == page["host"]:
                tags.append("same-host")
            elif lh.split("-", 1)[0] == page["host"].split("-", 1)[0]:
                tags.append("same-owner")
            else:
                tags.append("external")
            if link["kind"] != "text":
                tags.append(link["kind"])
            if cu == page["url"]:
                tags.append("anchor")
            for t in tags:
                counts[(page["host"], t)] = counts.get((page["host"], t), 0) + 1
    return values_sql(
        [("host", "VARCHAR"), ("tag", "VARCHAR"), ("n_links", "BIGINT")],
        [(h, t, n) for (h, t), n in counts.items()],
    )


# --------------------------------------------------------------------------
# A3/E3 — the reference's signature Provider lifecycle query (SURVEY.md
# §3.1 E3: per-provider/day/batch article + error counts from the stored
# JSON db) re-expressed as a ROLLUP over OUR fetch_log store.
# --------------------------------------------------------------------------
def q_crawl_provider_stats(spark, sf_dir):
    eng = _engine(spark)
    log = eng.store.read(spark, "fetch_log")
    return (
        log.select(
            "source",
            F.to_date(F.timestamp_seconds(F.col("fetch_ts")))
            .cast("string")
            .alias("day"),
            "wave",
            "status",
        )
        .rollup("source", "day", "wave")
        .agg(
            F.count("*").alias("n_fetches"),
            F.sum((F.col("status") == 200).cast("long")).alias("n_ok"),
            F.sum((F.col("status") != 200).cast("long")).alias("n_err"),
        )
    )


def _sql_provider_stats() -> str:
    from datetime import datetime, timezone

    rows = [
        (
            r["source"],
            datetime.fromtimestamp(r["fetch_ts"], tz=timezone.utc)
            .date()
            .isoformat(),
            r["wave"],
            r["status"],
        )
        for r in _sim().crawl_order
    ]
    base = values_sql(
        [
            ("source", "VARCHAR"),
            ("day", "VARCHAR"),
            ("wave", "INT"),
            ("status", "INT"),
        ],
        rows,
    )
    return f"""
SELECT source, day, wave, CAST(COUNT(*) AS BIGINT) AS n_fetches,
       CAST(SUM(CASE WHEN status = 200 THEN 1 ELSE 0 END) AS BIGINT) AS n_ok,
       CAST(SUM(CASE WHEN status <> 200 THEN 1 ELSE 0 END) AS BIGINT) AS n_err
FROM ({base}) GROUP BY ROLLUP(source, day, wave)
"""


# --------------------------------------------------------------------------
# S6/S7 — snapshot lineage metadata tables (Iceberg-style #snapshots + root)
# --------------------------------------------------------------------------
def q_crawl_lineage(spark, sf_dir):
    """Per-table snapshot counts + modes from the crawl store's metadata
    tables, plus the root-pointer history length — the lineage a judge (or
    an operator) reads to audit which wave committed what.  Rows-only check:
    commit ids are random, but the SHAPE of the lineage is deterministic."""
    eng = _engine(spark)
    rows = []
    for t in eng.store.list_tables():
        snaps = [eng.store.manifest(t, v) for v in eng.store.versions(t)]
        rows.append(
            (
                t,
                len(snaps),
                sum(1 for m in snaps if m and m["mode"] == "append"),
                sum(1 for m in snaps if m and m["mode"] == "overwrite"),
                int(eng.store.row_count(t) or 0),
            )
        )
    root = eng.store._root_current()
    rows.append(("_root", (root["version"] + 1) if root else 0, 0, 0, 0))
    return spark.createDataFrame(
        rows,
        "table string, n_snapshots int, n_appends int, n_overwrites int, live_rows long",
    ).orderBy("table")


def QUERIES() -> dict[str, tuple]:
    """Callable (not a constant) because oracle VALUES need the fixture."""
    return {
        "crawl_lineage": (q_crawl_lineage, None),
        "url_canonicalize": (q_url_canonicalize, _sql_url_canonicalize()),
        "crawl_wave0_frontier": (q_crawl_wave0_frontier, _sql_wave0()),
        "crawl_order": (q_crawl_order, _sql_crawl_order()),
        "crawl_seen_set": (q_crawl_seen_set, _sql_crawl_seen()),
        "crawl_wave_metrics": (q_crawl_wave_metrics, _sql_crawl_metrics()),
        "crawl_excluded": (q_crawl_excluded, _sql_crawl_excluded()),
        "link_tag_counts_full": (q_link_tag_counts_full, _sql_link_tags_full()),
        "crawl_provider_stats": (q_crawl_provider_stats, _sql_provider_stats()),
    }
