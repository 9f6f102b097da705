"""Scale-path near-duplicate detection over ``documents`` (task brief):
MinHash+LSH (shingle → minhash → band → bucket-join) and SimHash banding.

Signatures are computed in vectorized pandas UDFs (Arrow batches, numpy
matrix math — no per-row Python); candidate generation and verification are
pure DataFrame ops (explode → equi-join on band buckets), the same banding
pattern the crawl engine uses for pHash image near-dups (SURVEY.md §2.3 D6).

No SQL oracle (driver records rows-only): MinHash permutations are not
expressible in ANSI SQL — tests verify recall against the exact n-gram
Jaccard join instead (tests/test_dedup_ops.py).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, LongType

from csxj_crawler_spark.operators import banding

_P = np.uint64((1 << 61) - 1)  # Mersenne prime for the hash family
N_HASHES = 64
N_BANDS = 8  # 8 bands × 8 rows
ROWS_PER_BAND = N_HASHES // N_BANDS

# fixed affine hash family (deterministic, no in-session RNG)
_A = (np.arange(1, N_HASHES + 1, dtype=np.uint64) * np.uint64(0x9E3779B97F4A7C15)) | np.uint64(1)
_B = np.arange(N_HASHES, dtype=np.uint64) * np.uint64(0xC2B2AE3D27D4EB4F)


def _shingle_hashes(text: str) -> np.ndarray:
    toks = text.split()
    if len(toks) < 3:
        sh = [" ".join(toks)] if toks else []
    else:
        sh = [" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)]
    if not sh:
        return np.zeros(0, dtype=np.uint64)
    return pd.util.hash_array(np.asarray(sh, dtype=object)).astype(np.uint64)


@F.pandas_udf(ArrayType(LongType()))
def minhash_sig(texts: pd.Series) -> pd.Series:
    out = []
    for t in texts.fillna(""):
        h = _shingle_hashes(t)
        if len(h) == 0:
            out.append([0] * N_HASHES)
            continue
        # (n_shingles, N_HASHES) affine family, min per column
        vals = (h[:, None] * _A[None, :] + _B[None, :]) % _P
        out.append(vals.min(axis=0).astype(np.int64).tolist())
    return pd.Series(out)


@F.pandas_udf(LongType())
def simhash64(texts: pd.Series) -> pd.Series:
    """Whole-batch vectorized simhash: one hash_array over ALL tokens of the
    Arrow batch, a single (tokens × 64) bit matrix, and per-document
    segment sums via ``np.add.reduceat`` — no per-document Python loop.
    A zero-length document contributes an empty segment (its start equals
    the next document's start), so filtering to non-empty documents keeps
    reduceat's consecutive-boundary semantics exact."""
    toks_per_doc = [t.split() for t in texts.fillna("")]
    lens = np.array([len(t) for t in toks_per_doc], dtype=np.int64)
    out = np.zeros(len(texts), dtype=np.int64)
    if lens.sum() == 0:
        return pd.Series(out)
    all_toks = np.asarray(
        [tok for toks in toks_per_doc for tok in toks], dtype=object
    )
    h = pd.util.hash_array(all_toks).astype(np.uint64)
    shifts = np.arange(64, dtype=np.uint64)[None, :]
    bits = ((h[:, None] >> shifts) & np.uint64(1)).astype(np.int64)
    nonzero = lens > 0
    starts = (np.cumsum(lens) - lens)[nonzero]
    sums = np.add.reduceat(bits, starts, axis=0)
    v = 2 * sums - lens[nonzero, None]
    sig = ((v > 0).astype(np.uint64) << shifts).sum(axis=1, dtype=np.uint64)
    out[nonzero] = sig.view(np.int64)
    return pd.Series(out)


def minhash_band_keys(d: DataFrame) -> DataFrame:
    """Narrow banding frame: ``(doc_id, band_key)`` ONLY.  The 64-long
    signature array must NOT ride the band self-join — exploded ×8 bands on
    both shuffle sides it multiplies shuffle volume ~16× over this minimal
    frame at 100 TB.  Signatures are re-attached to the deduped pair set
    afterwards (two equi-joins on doc_id)."""
    return d.select(
        "doc_id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(N_BANDS - 1)),
                lambda b: F.slice(F.col("sig"), b * ROWS_PER_BAND + 1, ROWS_PER_BAND),
            )
        ).alias("band_id", "band_val"),
    ).select(
        "doc_id",
        F.xxhash64(
            F.col("band_id"),
            F.concat_ws(",", F.transform("band_val", lambda x: x.cast("string"))),
        ).alias("band_key"),
    )


def q_dedup_minhash_lsh(spark, sf_dir) -> DataFrame:
    """Candidate near-dup pairs via MinHash banding + signature-agreement
    estimate; keeps pairs with estimated Jaccard ≥ 0.5."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", minhash_sig(F.col("text")).alias("sig")
    )
    bands = minhash_band_keys(d)
    # occupancy-capped self-join: a degenerate band bucket cannot go
    # quadratic (spec.BAND_BUCKET_CAP; drop count observable, see banding.py)
    cand, _obs = banding.band_pairs(bands, ["band_key"], "doc_id")
    cand = cand.select(
        F.col("doc_id_a").alias("doc_a"), F.col("doc_id_b").alias("doc_b")
    )
    cand = cand.join(
        d.select(F.col("doc_id").alias("doc_a"), F.col("sig").alias("sig_a")), "doc_a"
    ).join(
        d.select(F.col("doc_id").alias("doc_b"), F.col("sig").alias("sig_b")), "doc_b"
    )
    est = F.aggregate(
        F.zip_with("sig_a", "sig_b", lambda x, y: (x == y).cast("int")),
        F.lit(0),
        lambda acc, x: acc + x,
    ) / F.lit(N_HASHES)
    return (
        cand.withColumn("est_jaccard", F.round(est, 6))
        .filter(F.col("est_jaccard") >= 0.5)
        .select("doc_a", "doc_b", "est_jaccard")
    )


def q_dedup_simhash(spark, sf_dir) -> DataFrame:
    """Near-dup pairs with SimHash Hamming distance ≤ 6 via 4×16-bit band
    blocking, verified with ``bit_count(a^b)`` — the same plan as the crawl
    engine's pHash prune (D6)."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", simhash64(F.col("text")).alias("sig")
    )
    bands = d.select(
        "doc_id",
        "sig",  # one long — cheaper riding the join than two re-attach joins
        F.posexplode(
            F.array(
                *[
                    F.shiftright(F.col("sig"), k * 16).bitwiseAND(F.lit(0xFFFF))
                    for k in range(4)
                ]
            )
        ).alias("band_id", "band_val"),
    )
    # occupancy cap: empty documents all SimHash to the same signature, so
    # ONE 16-bit band value can hold the whole degenerate class at 100 TB
    bands, _obs = banding.cap_band_buckets(bands, ["band_id", "band_val"], "doc_id")
    a, b = bands.alias("a"), bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.bit_count(F.col("a.sig").bitwiseXOR(F.col("b.sig"))).alias("hamming"),
        )
        .dropDuplicates(["doc_a", "doc_b"])
        .filter(F.col("hamming") <= 6)
    )


def q_membership_cuckoo(spark, sf_dir) -> DataFrame:
    """D5 cuckoo-filter membership over document fingerprints: build one
    filter per bucket from the even half, probe the odd half, return probed
    rows flagged maybe-present.  Deletion support is what distinguishes the
    cuckoo path (frontier retractions); no SQL oracle — the filter's exact
    no-false-negative contract is verified in tests/test_membership.py."""
    from csxj_crawler_spark.operators.membership import CuckooFilter

    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        F.xxhash64("text").alias("h"),
        F.pmod(F.xxhash64("doc_id"), F.lit(8)).alias("bucket"),
        F.col("doc_id"),
    )
    def _per_bucket(pdf: pd.DataFrame) -> pd.DataFrame:
        b = pdf[pdf["h"] % 2 == 0]
        p = pdf[pdf["h"] % 2 != 0]
        cf = CuckooFilter(capacity=max(64, len(b)))
        if len(b):
            cf.insert_many(b["h"].to_numpy())
        hit = cf.contains_many(p["h"].to_numpy()) if len(p) else []
        return pd.DataFrame({"doc_id": p["doc_id"], "maybe_present": list(hit)})

    return (
        d.groupBy("bucket")
        .applyInPandas(_per_bucket, "doc_id long, maybe_present boolean")
        .filter("NOT maybe_present")
    )


QUERIES: dict[str, tuple] = {
    "dedup_minhash_lsh": (q_dedup_minhash_lsh, None),
    "dedup_simhash": (q_dedup_simhash, None),
    "membership_cuckoo": (q_membership_cuckoo, None),
}
