"""ArticleData structured extraction (operators/articles.py) vs the fixture
generator's truth fields — golden-output equality per source, the same test
strategy as the reference's four per-datasource parser suites
(SURVEY.md §5.1: saved blobs in, expected field values out)."""

from __future__ import annotations

from pyspark.sql import functions as F

from csxj_crawler_spark.operators.articles import extract_article_data


def _extracted(spark, fix_dir):
    raw = spark.read.parquet(f"{fix_dir}/articles_raw.parquet")
    got = extract_article_data(raw).withColumn(
        "pub_str", F.date_format("pub_ts", "yyyy-MM-dd HH:mm")
    )
    return {r["url"]: r for r in got.collect()}


def test_extraction_matches_golden_all_sources(spark, fix_dir):
    golden = {
        r["url"]: r
        for r in spark.read.parquet(f"{fix_dir}/articles_golden.parquet").collect()
    }
    got = _extracted(spark, fix_dir)
    assert set(got) == set(golden)
    seen_sources = set()
    for url, g in golden.items():
        e = got[url]
        seen_sources.add(g["source"])
        assert e["source"] == g["source"]
        assert e["title"] == g["title"], (url, e["title"], g["title"])
        assert e["pub_str"] == g["pub_ts"], (url, e["pub_str"], g["pub_ts"])
        assert e["author"] == g["author"], (url, e["author"], g["author"])
        assert list(e["category"]) == list(g["category"]), url
        assert e["intro"] == g["intro"], url
        assert list(e["content"]) == list(g["content"]), url
    # per-source dispatch is real: every layout parsed in this run
    assert seen_sources == {"lesoir", "lalibre", "dhnet", "sudinfo"}


def test_unknown_source_yields_null_row_not_abort(spark):
    raw = spark.createDataFrame(
        [("http://x.example/a", "unknown-src", "<html><h1>t</h1></html>")],
        "url string, source string, raw_html string",
    )
    rows = extract_article_data(raw).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["title"] is None and r["pub_ts"] is None and r["author"] is None
    assert list(r["category"]) == [] and list(r["content"]) == []


def test_extraction_is_jvm_only_and_prunes_blob(spark, fix_dir):
    """No Python UDF in the plan, and selecting only metadata must NOT read
    raw_html (column pruning reaches the scan)."""
    raw = spark.read.parquet(f"{fix_dir}/articles_raw.parquet")
    full = extract_article_data(raw)
    plan = full._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    slim = raw.select("url", "source")
    pruned_plan = slim._jdf.queryExecution().executedPlan().toString()
    assert "raw_html" not in pruned_plan.split("ReadSchema")[-1]
