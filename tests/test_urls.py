"""P1-P3: canonicalization parity (expr == pandas UDF == pure-Python
reference impl), idempotence, hashing/bucketing properties."""

from __future__ import annotations

import pandas as pd
import pyarrow.parquet as pq
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from csxj_crawler_spark.fixtures.simulator import canon_py
from csxj_crawler_spark.functions import urls as U
from csxj_crawler_spark.functions.urls import _canon_pandas


def _fixture_urls(fix_dir):
    urls = []
    for r in pq.read_table(f"{fix_dir}/seeds.parquet").to_pylist():
        urls.append(r["url"])
    for page in pq.read_table(f"{fix_dir}/web_graph.parquet").to_pylist():
        for l in page["outlinks"] or []:
            urls.append(l["url"])
    return urls


def test_pandas_matches_python_reference(fix_dir):
    urls = _fixture_urls(fix_dir)
    got = _canon_pandas(pd.Series(urls)).tolist()
    want = [canon_py(u) for u in urls]
    assert got == want


def test_expr_matches_python_reference(spark, fix_dir):
    from pyspark.sql import functions as F

    urls = _fixture_urls(fix_dir)[:500]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    got = [r[0] for r in df.select(U.canonicalize_expr(F.col("url"))).collect()]
    want = [canon_py(u) for u in urls]
    assert got == want


def test_udf_matches_expr(spark, fix_dir):
    from pyspark.sql import functions as F

    urls = _fixture_urls(fix_dir)[:500]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    rows = df.select(
        U.canonicalize_expr(F.col("url")).alias("e"),
        U.canonicalize_udf(F.col("url")).alias("u"),
    ).collect()
    assert all(r["e"] == r["u"] for r in rows)


def test_arrow_tracking_chain_and_splice_regression():
    """Round-4 regression (ADVICE r3, high): pass 4a's removal can SPLICE new
    adjacent tracking pairs, and chains of pairs need the lookahead semantics;
    the arrow path now loops its consuming 4b rewrite to a fixpoint."""
    from csxj_crawler_spark.functions.urls import _canon_arrow

    cases = [
        "http://h/?ututm_a=1&m_y=1&ututm_b=2&m_w=3&end",  # the ADVICE repro
        "http://h/?utm_a=1&utm_b=2&utm_c=3",  # chain, consuming-skip shape
        "http://h/?x=1&utm_a=1&utm_b=2&utm_c=3&y=2",
        "http://h/?ututm_a=1&m_b=2&ututm_c=3&m_d=4",  # double splice
        "http://h/?a=but&m_x=3&end",  # mid-value splice must NOT be removed
    ]
    got = _canon_arrow(pd.Series(cases)).tolist()
    want = _canon_pandas(pd.Series(cases)).tolist()
    assert got == want
    assert want[0] == "http://h/&end"


_hosts = st.sampled_from(["lesoir-0.example", "A-B.Example", "x.org"])
_paths = st.lists(
    st.text(alphabet="abcZ09._-", min_size=1, max_size=6), min_size=0, max_size=4
).map(lambda segs: "/" + "/".join(segs))
_queries = st.lists(
    st.tuples(
        st.sampled_from(["page", "id", "utm_source", "utm_x", "fbclid", "q"]),
        st.text(alphabet="ab12", min_size=0, max_size=4),
    ),
    min_size=0,
    max_size=4,
).map(lambda kvs: "&".join(f"{k}={v}" for k, v in kvs))


@settings(max_examples=300, deadline=None)
@given(
    scheme=st.sampled_from(["http", "HTTP", "https"]),
    host=_hosts,
    port=st.sampled_from(["", ":80", ":443", ":8080"]),
    path=_paths,
    slash=st.booleans(),
    query=_queries,
    frag=st.sampled_from(["", "#x", "#a-b"]),
)
def test_canon_idempotent_and_matches(scheme, host, port, path, slash, query, frag):
    url = f"{scheme}://{host}{port}{path}"
    if slash and path != "/":
        url += "/"
    if query:
        url += "?" + query
    url += frag
    want = canon_py(url)
    got = _canon_pandas(pd.Series([url])).iloc[0]
    assert got == want
    # idempotence: canon(canon(u)) == canon(u)
    assert canon_py(want) == want
    assert _canon_pandas(pd.Series([got])).iloc[0] == got


def test_host_bucket_stable_and_bounded(spark, fix_dir):
    from pyspark.sql import functions as F

    df = spark.read.parquet(f"{fix_dir}/seeds.parquet").select(
        U.canonicalize_expr(F.col("url")).alias("url")
    )
    out = df.select(
        U.host_of(F.col("url")).alias("host"),
        U.host_bucket(U.host_of(F.col("url")), 8).alias("b"),
        U.url_hash(F.col("url")).alias("h"),
    ).collect()
    assert all(0 <= r["b"] < 8 for r in out)
    by_host = {}
    for r in out:
        by_host.setdefault(r["host"], set()).add(r["b"])
    assert all(len(v) == 1 for v in by_host.values())


# alphabet includes u/t/m so the strategy can FORM tracking params (`utm_a=1`)
# and splice-prone neighborhoods (`ututm_a=1&m_y=1`) — the round-3 arrow/pandas
# divergence lived exactly there and the old alphabet could never reach it
_nasty = st.text(
    alphabet="utmabAB09:/?&=#._-%+~ \t", min_size=0, max_size=40
)


@settings(max_examples=400, deadline=None)
@given(s=_nasty)
def test_arrow_canon_matches_re_reference_nasty(s):
    """_canon_arrow (RE2 kernels) must be bit-identical to _canon_pandas
    (Python re) on arbitrary junk, not just well-formed URLs — this locks the
    consuming rewrites of the three lookahead patterns."""
    from csxj_crawler_spark.functions.urls import _canon_arrow

    assert _canon_arrow(pd.Series([s])).iloc[0] == _canon_pandas(
        pd.Series([s])
    ).iloc[0]


@settings(max_examples=200, deadline=None)
@given(
    scheme=st.sampled_from(["http", "HTTP", "https", "HtTpS"]),
    host=_hosts,
    port=st.sampled_from(["", ":80", ":443", ":8080"]),
    path=_paths,
    query=_queries,
    extra=st.sampled_from(["", "&", "&&", "&utm_a=", "?"]),
    frag=st.sampled_from(["", "#x"]),
)
def test_arrow_canon_matches_re_reference_urls(
    scheme, host, port, path, query, extra, frag
):
    from csxj_crawler_spark.functions.urls import _canon_arrow

    url = f"{scheme}://{host}{port}{path}"
    if query:
        url += "?" + query
    url += extra + frag
    a = _canon_arrow(pd.Series([url])).iloc[0]
    r = _canon_pandas(pd.Series([url])).iloc[0]
    assert a == r
