"""Distributed connected components — the cluster-resolution stage of the
dedup pipeline (LSH candidate pairs → duplicate CLUSTERS → one canonical
document per cluster).

Pairwise near-dup output (``dedup_minhash_lsh`` / ``dedup_simhash`` /
``image_phash_neardup``) is not directly actionable at 100 TB: "keep one
copy" needs the transitive closure of the pair relation.  This module
computes it with the alternating **large-star / small-star** algorithm of
Kiveris et al., "Connected Components in MapReduce and Beyond" (SoCC 2014)
— the standard shuffle-based CC used by web-scale dedup pipelines —
expressed as pure DataFrame ops:

* each round is two groupBy-min + self-join passes over the EDGE list only
  (never materializes neighborhoods on the driver, no ``.collect()``, no
  cartesian);
* converges in O(log^2 n) rounds even on pathological path graphs (plain
  min-label propagation needs O(diameter) — unusable on a 10^6-long chain);
* per-round ``localCheckpoint`` truncates plan lineage so the iteration
  count never blows up the optimizer (on a real cluster swap for
  ``checkpoint()`` on HDFS — same call site, noted below);
* convergence is detected with a one-pass order-independent checksum
  (count + sum of xxhash64(u,v)) instead of a set-difference join.

Reference parity note: /root/reference is empty (rounds 1-5); SURVEY.md §2
reconstructs dedup as D6/D7 + the LLM-pipeline dedup family, whose output
contract ("prune near-duplicates") requires exactly this closure step.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["connected_components"]


def _large_star(sym: DataFrame) -> DataFrame:
    """Kiveris large-star: for every node u, connect each STRICTLY LARGER
    neighbor v to m = min(neighbors(u) + [u]).  Input must be the
    symmetric, self-loop-free edge list; output is directed (child, parent)
    with child > parent always (m <= u < v)."""
    mins = sym.groupBy("u").agg(F.min("v").alias("mn"))
    mins = mins.select("u", F.least("u", "mn").alias("m"))
    return (
        sym.filter(F.col("v") > F.col("u"))
        .join(mins, "u")
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .distinct()
    )


def _small_star(e: DataFrame) -> DataFrame:
    """Kiveris small-star: orient every edge toward the smaller endpoint;
    for each node u connect all of its smaller neighbors (and u itself) to
    m = min of those neighbors.  Output again (child, parent), child > m."""
    orient = (
        e.filter(F.col("u") != F.col("v"))
        .select(F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v"))
        .distinct()
    )
    mins = orient.groupBy("u").agg(F.min("v").alias("m"))
    return (
        orient.join(mins, "u")
        .select(F.col("v").alias("u"), "m")
        .union(mins.select("u", "m"))
        .filter(F.col("u") != F.col("m"))
        .select("u", F.col("m").alias("v"))
        .distinct()
    )


def connected_components(
    edges: DataFrame, src: str = "src", dst: str = "dst", max_iter: int = 25
) -> DataFrame:
    """Connected components of the undirected graph given by ``edges``.

    Returns ``(node, component)`` with one row per node that appears in any
    edge; ``component`` is the SMALLEST node id in that node's component
    (the usual canonical-representative convention — the kept document in a
    dedup cluster).  Roots are included (``component == node``); isolated
    nodes never appear in ``edges`` and are the caller's left-join+coalesce.

    Scale posture: each round shuffles only the current (child, parent)
    edge list — O(E) rows of two longs — twice (one groupBy-min, one
    equi-join, both on the same key so AQE can co-locate them).  Edge count
    is non-increasing after the first round; rounds are O(log^2 n) worst
    case and 2-4 in practice on dedup graphs (near-clique clusters).
    ``max_iter`` is a safety valve: hitting it raises rather than returning
    a half-contracted forest.
    """
    e = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    prev_chk = None
    for _ in range(max_iter):
        sym = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        e = _small_star(_large_star(sym))
        # On a YARN/K8s cluster use .checkpoint() (reliable, HDFS) here; in
        # local mode localCheckpoint gives the same lineage truncation.
        e = e.localCheckpoint(eager=True)
        row = e.agg(
            F.count(F.lit(1)).alias("n"),
            # decimal(38,0) accumulator: a plain long sum of 2^63-scale
            # hashes overflows under ANSI mode after a handful of rows
            F.sum(F.xxhash64("u", "v").cast("decimal(38,0)")).alias("h"),
        ).first()
        chk = (row["n"], row["h"])
        if chk == prev_chk:
            break
        prev_chk = chk
    else:
        raise RuntimeError(f"connected_components: no convergence in {max_iter} rounds")
    # e is now a star forest: (node, root) for every non-root node
    roots = e.select(F.col("v").alias("u"), F.col("v")).distinct()
    return e.union(roots).select(
        F.col("u").alias("node"), F.col("v").alias("component")
    )
