"""ArticleData-style structured extraction (SURVEY.md §1.1 `ArticleData`,
§5.1 per-datasource parser suites): parse a stored page blob into one typed
row — title, author, publication timestamp, category breadcrumb, intro,
content paragraphs — with per-source layout dispatch, the analogue of the
reference's four datasource parsers (lesoir/lalibre/dhnet/sudinfo).

Spark-first shape: everything is JVM-side (`regexp_extract`,
`regexp_extract_all`, `to_timestamp`, `split` inside whole-stage codegen) —
no Python touches the blobs, so extraction pipelines with the scan at 100 TB
and Catalyst prunes `raw_html` whenever a query selects only metadata.
Dispatch is a `CASE WHEN` on the ``source`` column: adding a fifth layout is
one more `_LAYOUTS` entry, not a new job.  Body paragraphs are extracted in
two steps (container substring with a `(?s)` regex, then per-paragraph
`regexp_extract_all`) so intro/byline paragraphs can never leak into
content.

Outlink extraction is deliberately NOT here — the crawl path's TaggedURL
classification (queries/crawlops.py P5) covers links; this operator covers
the article body fields.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _rx(col: Column, pattern: str, group: int = 1) -> Column:
    return F.regexp_extract(col, pattern, group)


def _paras(col: Column, container: str, para: str) -> Column:
    """Paragraph list scoped to a container: extract the container substring
    (``(?s)`` so it spans lines), then all paragraph group-1 matches in it."""
    return F.regexp_extract_all(_rx(col, container), F.lit(para), F.lit(1))


_LALIBRE_DATE = r"Publié le (\d{2})/(\d{2})/(\d{4}) à (\d{2})h(\d{2})"
_SUDINFO_DATE = r'<span class="date">(\d{2})/(\d{2})/(\d{4}) (\d{2}:\d{2})</span>'


#: per-source layout rules: unified field -> source-specific extraction over
#: ``raw_html``.  ``pub_norm`` is normalized to "yyyy-MM-dd HH:mm" (each
#: source spells its date differently) before one shared to_timestamp.
def _layout_exprs(h: Column) -> dict[str, dict[str, Column]]:
    return {
        "lesoir": {
            "title": _rx(h, r'<h1 class="article__title">(.*?)</h1>'),
            "pub_norm": F.concat(
                _rx(h, r'<meta name="publication" content="(\d{4}-\d{2}-\d{2})T(\d{2}:\d{2})"', 1),
                F.lit(" "),
                _rx(h, r'<meta name="publication" content="(\d{4}-\d{2}-\d{2})T(\d{2}:\d{2})"', 2),
            ),
            "author": _rx(h, r'<span class="article__author">(.*?)</span>'),
            "crumb": _rx(h, r'<nav class="breadcrumb">(.*?)</nav>'),
            "crumb_sep": F.lit(" &gt; "),
            "intro": _rx(h, r'<p class="chapo">(.*?)</p>'),
            # the paragraph class is unique to body text — no container step
            "paras": F.regexp_extract_all(
                h, F.lit(r'<p class="article-par">(.*?)</p>'), F.lit(1)
            ),
        },
        "lalibre": {
            "title": _rx(h, r'<h1 id="articleTitle">(.*?)</h1>'),
            "pub_norm": F.concat(
                _rx(h, _LALIBRE_DATE, 3), F.lit("-"),
                _rx(h, _LALIBRE_DATE, 2), F.lit("-"),
                _rx(h, _LALIBRE_DATE, 1), F.lit(" "),
                _rx(h, _LALIBRE_DATE, 4), F.lit(":"),
                _rx(h, _LALIBRE_DATE, 5),
            ),
            "author": _rx(h, r'<em class="signature">(.*?)</em>'),
            # capture the inner <li>...</li> run without the outer tags
            "crumb": _rx(h, r'<ul class="breadcrumb"><li>(.*)</li></ul>'),
            "crumb_sep": F.lit("</li><li>"),
            "intro": _rx(h, r'<div class="intro"><p>(.*?)</p></div>'),
            "paras": _paras(
                h, r'(?s)<div class="article-body">(.*?)</div>', r"<p>(.*?)</p>"
            ),
        },
        "dhnet": {
            "title": _rx(h, r'<h2 class="titre">(.*?)</h2>'),
            "pub_norm": _rx(h, r'<time datetime="(\d{4}-\d{2}-\d{2} \d{2}:\d{2})">'),
            "author": _rx(h, r'<p class="auteur">Par (.*?)</p>'),
            "crumb": _rx(h, r'<div class="filariane">(.*?)</div>'),
            "crumb_sep": F.lit("/"),
            "intro": _rx(h, r'<p class="lead">(.*?)</p>'),
            "paras": _paras(
                h, r'(?s)<section class="texte">(.*?)</section>', r"<p>(.*?)</p>"
            ),
        },
        "sudinfo": {
            "title": _rx(h, r"<h1>(.*?)</h1>"),
            "pub_norm": F.concat(
                _rx(h, _SUDINFO_DATE, 3), F.lit("-"),
                _rx(h, _SUDINFO_DATE, 2), F.lit("-"),
                _rx(h, _SUDINFO_DATE, 1), F.lit(" "),
                _rx(h, _SUDINFO_DATE, 4),
            ),
            "author": _rx(h, r'<span class="byline">(.*?)</span>'),
            "crumb": _rx(h, r'<p class="crumbs">(.*?)</p>'),
            "crumb_sep": F.lit(" \\| "),
            "intro": _rx(h, r'<p class="intro">(.*?)</p>'),
            "paras": F.regexp_extract_all(
                h, F.lit(r'<p class="par">(.*?)</p>'), F.lit(1)
            ),
        },
    }


_SOURCES = ("lesoir", "lalibre", "dhnet", "sudinfo")


def _dispatch(source: Column, per_source: dict[str, Column]) -> Column:
    expr = F.lit(None)
    for s in _SOURCES:
        expr = F.when(source == s, per_source[s]).otherwise(expr)
    return expr


def extract_article_data(
    raw: DataFrame, html_col: str = "raw_html", source_col: str = "source"
) -> DataFrame:
    """One typed ArticleData row per page blob, dispatched on ``source``.

    Empty extractions become NULL (``title``/``author``/``intro``) or empty
    arrays (``category``/``content``); an unknown source yields NULL fields
    rather than failing the job (error rows, not aborts — a new source
    layout is a code change, a stray row is data).  Golden-equality tested
    per source against the fixture generator's truth fields
    (tests/test_articles.py).
    """
    h = F.col(html_col)
    src = F.col(source_col)
    lay = _layout_exprs(h)

    def field(name: str) -> Column:
        return _dispatch(src, {s: lay[s][name] for s in _SOURCES})

    def null_if_empty(c: Column) -> Column:
        return F.when(c == "", None).otherwise(c)

    crumb = null_if_empty(field("crumb"))
    return raw.select(
        "url",
        src.alias("source"),
        null_if_empty(field("title")).alias("title"),
        F.to_timestamp(
            null_if_empty(field("pub_norm")), "yyyy-MM-dd HH:mm"
        ).alias("pub_ts"),
        null_if_empty(field("author")).alias("author"),
        F.when(crumb.isNull(), F.expr("CAST(array() AS array<string>)"))
        .otherwise(
            F.split(crumb, _dispatch(src, {s: lay[s]["crumb_sep"] for s in _SOURCES}))
        )
        .alias("category"),
        null_if_empty(field("intro")).alias("intro"),
        F.filter(F.coalesce(field("paras"), F.expr("CAST(array() AS array<string>)")),
                 lambda p: p != "").alias("content"),
    )
