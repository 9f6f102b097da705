"""Text-analysis operators for a training-data pipeline over ``documents``:
token counting, quality scoring, stopword-based language scoring, content
fingerprinting, exact dedup (task brief: first-class alongside SURVEY.md §2).

All expressed with JVM-side built-ins (split / HOFs / md5) — no Python in the
hot path; each has an exact DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_STOP_EN = ("the", "a", "of", "and", "to", "in", "is")
_STOP_SQLLIKE = ("table", "row", "column", "query", "join", "scan")


def _docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _toks(col):
    return F.split(F.trim(col), r"\s+")


# --------------------------------------------------------------------------
# token counting (whitespace tokenizer) + BPE-ish subword estimate
# --------------------------------------------------------------------------
def q_text_token_counts(spark, sf_dir):
    d = _docs(spark, sf_dir)
    toks = _toks(F.col("text"))
    return d.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.length(F.trim("text")).alias("n_chars_trim"),
        # BPE-ish upper bound: ceil(chars/4) is the classic heuristic
        F.ceil(F.length(F.trim("text")) / 4).cast("long").alias("n_bpe_est"),
    )


SQL_text_token_counts = r"""
SELECT doc_id,
       CAST(LEN(regexp_split_to_array(TRIM(text), '\s+')) AS INT) AS n_tokens,
       CAST(LENGTH(TRIM(text)) AS INT) AS n_chars_trim,
       CAST(CEIL(LENGTH(TRIM(text)) / 4.0) AS BIGINT) AS n_bpe_est
FROM documents
"""


# --------------------------------------------------------------------------
# quality scoring: stopword ratio, mean token length, distinct-token ratio
# --------------------------------------------------------------------------
def q_text_quality(spark, sf_dir):
    d = _docs(spark, sf_dir)
    toks = _toks(F.col("text"))
    n = F.size(toks)
    stop_arr = F.array(*[F.lit(s) for s in _STOP_EN])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t)))
    n_dist = F.size(F.array_distinct(toks))
    return d.select(
        "doc_id",
        n.alias("n_tokens"),
        F.round(n_stop / n, 6).alias("stopword_ratio"),
        F.round(F.length(F.trim("text")) / n, 6).alias("chars_per_token"),
        F.round(n_dist / n, 6).alias("distinct_ratio"),
        (n_dist / n > 0.3).alias("quality_ok"),
    )


SQL_text_quality = r"""
WITH t AS (
  SELECT doc_id, TRIM(text) AS txt,
         regexp_split_to_array(TRIM(text), '\s+') AS toks
  FROM documents
)
SELECT doc_id,
       CAST(LEN(toks) AS INT) AS n_tokens,
       ROUND(LEN(list_filter(toks, x -> x IN ('the','a','of','and','to','in','is')))
             * 1.0 / LEN(toks), 6) AS stopword_ratio,
       ROUND(LENGTH(txt) * 1.0 / LEN(toks), 6) AS chars_per_token,
       ROUND(LEN(list_distinct(toks)) * 1.0 / LEN(toks), 6) AS distinct_ratio,
       (LEN(list_distinct(toks)) * 1.0 / LEN(toks)) > 0.3 AS quality_ok
FROM t
"""


# --------------------------------------------------------------------------
# language scoring (n-gram/stopword heuristic, deterministic)
# --------------------------------------------------------------------------
def q_text_lang_scores(spark, sf_dir):
    d = _docs(spark, sf_dir)
    toks = _toks(F.lower(F.col("text")))
    en_arr = F.array(*[F.lit(s) for s in _STOP_EN])
    sq_arr = F.array(*[F.lit(s) for s in _STOP_SQLLIKE])
    s_en = F.size(F.filter(toks, lambda t: F.array_contains(en_arr, t)))
    s_sq = F.size(F.filter(toks, lambda t: F.array_contains(sq_arr, t)))
    return d.select(
        "doc_id",
        "lang",
        s_en.alias("score_en"),
        s_sq.alias("score_domain"),
        F.when(s_en >= s_sq, F.lit("en")).otherwise(F.lit("domain")).alias("pred"),
    )


SQL_text_lang_scores = r"""
WITH t AS (
  SELECT doc_id, lang,
         regexp_split_to_array(TRIM(LOWER(text)), '\s+') AS toks
  FROM documents
)
SELECT doc_id, lang,
       CAST(LEN(list_filter(toks, x -> x IN ('the','a','of','and','to','in','is'))) AS INT)
         AS score_en,
       CAST(LEN(list_filter(toks, x -> x IN ('table','row','column','query','join','scan'))) AS INT)
         AS score_domain,
       CASE WHEN LEN(list_filter(toks, x -> x IN ('the','a','of','and','to','in','is')))
                 >= LEN(list_filter(toks, x -> x IN ('table','row','column','query','join','scan')))
            THEN 'en' ELSE 'domain' END AS pred
FROM t
"""


# --------------------------------------------------------------------------
# document fingerprinting: content md5 + head-shingle md5
# --------------------------------------------------------------------------
def q_doc_fingerprint(spark, sf_dir):
    d = _docs(spark, sf_dir)
    toks = _toks(F.col("text"))
    head = F.concat_ws(" ", F.slice(toks, 1, 8))
    return d.select(
        "doc_id",
        F.md5(F.trim("text")).alias("content_fp"),
        F.md5(head).alias("head_fp"),
    )


SQL_doc_fingerprint = r"""
SELECT doc_id, md5(TRIM(text)) AS content_fp,
       md5(array_to_string(list_slice(regexp_split_to_array(TRIM(text), '\s+'), 1, 8), ' '))
         AS head_fp
FROM documents
"""


# --------------------------------------------------------------------------
# exact dedup (hash-groupBy, keep min doc_id) — D7 analogue on documents
# --------------------------------------------------------------------------
def q_dedup_exact(spark, sf_dir):
    d = _docs(spark, sf_dir)
    return (
        d.groupBy(F.md5(F.trim("text")).alias("content_fp"))
        .agg(F.min("doc_id").alias("keep_doc_id"), F.count("*").alias("n_copies"))
    )


SQL_dedup_exact = """
SELECT md5(TRIM(text)) AS content_fp, MIN(doc_id) AS keep_doc_id,
       COUNT(*) AS n_copies
FROM documents GROUP BY 1
"""


# --------------------------------------------------------------------------
# n-gram (3-shingle) Jaccard near-dup pairs — exact, join-based (D6 analogue)
# --------------------------------------------------------------------------
JACCARD_T = 0.12


def q_dedup_ngram_jaccard(spark, sf_dir):
    d = _docs(spark, sf_dir)
    # Linear shingle construction: zip_with over three shifted slices.
    # (transform(sequence, i -> element_at(toks, i+k)) re-evaluates the
    # split() for EVERY index once CollapseProject inlines the alias —
    # O(tokens^2) per document; slices evaluate it a constant 3 times.)
    toks = _toks(F.col("text"))
    n = F.size(toks)
    m = F.greatest(n - 2, F.lit(0))
    tri = F.zip_with(
        F.zip_with(
            F.slice(toks, 1, m),
            F.slice(toks, 2, m),
            lambda x, y: F.concat_ws(" ", x, y),
        ),
        F.slice(toks, 3, m),
        lambda x, y: F.concat_ws(" ", x, y),
    )
    sh = F.array_distinct(tri)
    # join on the 64-bit shingle hash with a minimal (doc_id, h) payload —
    # the exploded self-join shuffles far less than with string shingles —
    # and bring per-doc shingle counts back via a broadcast lookup
    s = d.select("doc_id", sh.alias("sh"))
    sizes = s.select("doc_id", F.size("sh").alias("n_sh"))
    e = s.select("doc_id", F.explode("sh").alias("shingle")).select(
        "doc_id", F.xxhash64("shingle").alias("h")
    )
    a, b = e.alias("a"), e.alias("b")
    pairs = (
        a.join(b, (F.col("a.h") == F.col("b.h")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
        )
        .agg(F.count("*").alias("inter"))
        .join(F.broadcast(sizes.withColumnsRenamed({"doc_id": "doc_a", "n_sh": "n_a"})), "doc_a")
        .join(F.broadcast(sizes.withColumnsRenamed({"doc_id": "doc_b", "n_sh": "n_b"})), "doc_b")
        .withColumn("raw_j", F.col("inter") / (F.col("n_a") + F.col("n_b") - F.col("inter")))
        .filter(F.col("raw_j") >= JACCARD_T)
        .withColumn("jaccard", F.round(F.col("raw_j"), 6))
        .select("doc_a", "doc_b", "inter", "jaccard")
    )
    return pairs


SQL_dedup_ngram_jaccard = rf"""
WITH sh AS (
  SELECT doc_id,
         list_distinct(list_transform(range(1, GREATEST(LEN(toks)-1, 1)),
                       i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS shingles
  FROM (SELECT doc_id, regexp_split_to_array(TRIM(text), '\s+') AS toks FROM documents)
), e AS (
  SELECT doc_id, LEN(shingles) AS n_sh, UNNEST(shingles) AS shingle FROM sh
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter,
       ROUND(COUNT(*) * 1.0 / (a.n_sh + b.n_sh - COUNT(*)), 6) AS jaccard
FROM e a JOIN e b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
GROUP BY a.doc_id, b.doc_id, a.n_sh, b.n_sh
HAVING COUNT(*) * 1.0 / (a.n_sh + b.n_sh - COUNT(*)) >= {JACCARD_T}
"""


QUERIES: dict[str, tuple] = {
    "text_token_counts": (q_text_token_counts, SQL_text_token_counts),
    "text_quality": (q_text_quality, SQL_text_quality),
    "text_lang_scores": (q_text_lang_scores, SQL_text_lang_scores),
    "doc_fingerprint": (q_doc_fingerprint, SQL_doc_fingerprint),
    "dedup_exact": (q_dedup_exact, SQL_dedup_exact),
    "dedup_ngram_jaccard": (q_dedup_ngram_jaccard, SQL_dedup_ngram_jaccard),
}
