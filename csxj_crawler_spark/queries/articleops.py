"""ArticleData structured extraction under the driver contract (SURVEY.md
§1.1 `ArticleData`, §5.1 per-datasource parser suites): run the all-JVM
extraction operator (operators/articles.py) over the tiny fixture's stored
page blobs and verify every field against the fixture generator's truth
columns.

The oracle is literal VALUES read straight from ``articles_golden.parquet``
via pyarrow — the generator wrote those truth fields BEFORE rendering the
per-source HTML, so the oracle side never touches the extraction regexes
(the same independence the crawl queries get from the pure-Python
simulator).  List-typed fields (category breadcrumb, content paragraphs)
are compared as '|'-joined strings — the fixture vocabulary contains only
letters and spaces, so the join is lossless — plus an explicit paragraph
count."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from csxj_crawler_spark.operators.articles import extract_article_data
from csxj_crawler_spark.queries._fixture import tiny_fixture_dir, values_sql


def q_article_extract(spark, sf_dir) -> DataFrame:
    d = tiny_fixture_dir()
    raw = spark.read.parquet(f"{d}/articles_raw.parquet")
    a = extract_article_data(raw)
    return a.select(
        "url",
        "source",
        "title",
        F.date_format("pub_ts", "yyyy-MM-dd HH:mm").alias("pub_str"),
        "author",
        F.array_join("category", "|").alias("category"),
        "intro",
        F.array_join("content", "|").alias("content"),
        F.size("content").alias("n_paras"),
    )


def _sql_article_extract() -> str:
    import pyarrow.parquet as pq

    d = tiny_fixture_dir()
    rows = [
        (
            g["url"],
            g["source"],
            g["title"],
            g["pub_ts"],
            g["author"],
            "|".join(g["category"]),
            g["intro"],
            "|".join(g["content"]),
            len(g["content"]),
        )
        for g in pq.read_table(f"{d}/articles_golden.parquet").to_pylist()
    ]
    return values_sql(
        [
            ("url", "VARCHAR"),
            ("source", "VARCHAR"),
            ("title", "VARCHAR"),
            ("pub_str", "VARCHAR"),
            ("author", "VARCHAR"),
            ("category", "VARCHAR"),
            ("intro", "VARCHAR"),
            ("content", "VARCHAR"),
            ("n_paras", "INTEGER"),
        ],
        rows,
    )


def QUERIES() -> dict[str, tuple]:
    """Callable because the oracle VALUES come from the fixture's golden
    table."""
    return {"article_extract": (q_article_extract, _sql_article_extract())}
