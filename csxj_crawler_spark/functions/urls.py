"""URL canonicalization, hashing and host bucketing (SURVEY.md §2.2 P1-P3).

Reference parity: csxj-crawler compared raw URL strings after urlparse-level
cleanup when diffing fresh TOCs against the stored per-provider URL set
(SURVEY.md §2.2 P1, [M csxj/common/tagging.py]).  The exact rule is locked in
``spec`` and tested against the pure-Python simulator's independent
implementation.

Two implementations of the same rule:

* :func:`canonicalize_udf` — vectorized pandas UDF (Arrow batches, pure
  ``pd.Series.str`` ops — no per-row Python), per BASELINE.json:6
  "vectorized Arrow UDFs over canonicalized/hashed URLs".
* :func:`canonicalize_expr` — pure Spark Column expression (JVM-side,
  whole-stage-codegen friendly) for the hot path.  Tested to agree with the
  UDF bit-for-bit; the engine uses this one by default so canonicalization
  never leaves the JVM.

Hashing is always ``xxhash64`` (built-in, deterministic across sessions).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import StringType

from csxj_crawler_spark import spec

# ---------------------------------------------------------------------------
# regex building blocks (shared by both implementations)
# ---------------------------------------------------------------------------

# tracking params: exact names or utm_* prefix, as key=value pairs
_TRACK_ALT = "|".join(sorted(spec.TRACKING_PARAMS)) + "|utm_[a-z0-9_]*"
# a tracking pair inside a query string (value = anything up to & or end)
_TRACK_PAIR = rf"(?:{_TRACK_ALT})=[^&#]*"


def _canon_pandas(s: pd.Series) -> pd.Series:
    """Vectorized canonicalization over a pandas string Series."""
    s = s.fillna("").str.strip()
    # 1. strip fragment
    s = s.str.replace(r"#.*$", "", regex=True)
    # 2. lowercase scheme and host (authority part only)
    s = s.str.replace(
        r"^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]*)",
        lambda m: m.group(1).lower() + "://" + m.group(2).lower(),
        regex=True,
    )
    # 3. strip default ports
    s = s.str.replace(r"^(http://[^/?#:]*):80(?=[/?#]|$)", r"\1", regex=True)
    s = s.str.replace(r"^(https://[^/?#:]*):443(?=[/?#]|$)", r"\1", regex=True)
    # 4. drop tracking params (leading, middle, trailing), then tidy ?&
    s = s.str.replace(rf"(?:{_TRACK_PAIR}&)+", "", regex=True)
    s = s.str.replace(rf"[?&](?:{_TRACK_PAIR})(?=$|&)", "", regex=True)
    s = s.str.replace(r"\?&", "?", regex=True)
    s = s.str.replace(r"[?&]$", "", regex=True)
    # 5. ensure non-empty path before ? or end
    s = s.str.replace(r"^([a-z][a-z0-9+.-]*://[^/?#]+)(\?|$)", r"\1/\2", regex=True)
    # 6. strip trailing slash at end of non-root path (also before a query)
    s = s.str.replace(r"^([a-z][a-z0-9+.-]*://[^/?#]+/[^?#]*?)/+(\?|$)", r"\1\2", regex=True)
    return s


@F.pandas_udf(StringType())
def canonicalize_udf(urls: pd.Series) -> pd.Series:  # pragma: no cover - thin
    return _canon_pandas(urls)


def canonicalize_expr(col: Column) -> Column:
    """Same rule as :func:`canonicalize_udf` as a JVM-side Column expression.

    Stays inside whole-stage codegen — the preferred hot-path form.
    """
    c = F.trim(col)
    # strip fragment
    c = F.regexp_replace(c, r"#.*$", "")
    # lowercase scheme://host prefix. Spark regexp_replace cannot lowercase a
    # backreference, so split: head = scheme://authority, tail = rest.
    head = F.regexp_extract(c, r"^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)", 1)
    tail = F.substring(c, F.length(head) + F.lit(1), F.lit(1 << 30))
    c = F.concat(F.lower(head), tail)
    # strip default ports
    c = F.regexp_replace(c, r"^(http://[^/?#:]*):80(?=[/?#]|$)", "$1")
    c = F.regexp_replace(c, r"^(https://[^/?#:]*):443(?=[/?#]|$)", "$1")
    # drop tracking params
    c = F.regexp_replace(c, rf"(?:{_TRACK_PAIR}&)+", "")
    c = F.regexp_replace(c, rf"[?&](?:{_TRACK_PAIR})(?=$|&)", "")
    c = F.regexp_replace(c, r"\?&", "?")
    c = F.regexp_replace(c, r"[?&]$", "")
    # empty path → "/"
    c = F.regexp_replace(c, r"^([a-z][a-z0-9+.-]*://[^/?#]+)(\?|$)", "$1/$2")
    # trailing slash at end of non-root path (also before a query)
    c = F.regexp_replace(c, r"^([a-z][a-z0-9+.-]*://[^/?#]+/[^?#]*?)/+(\?|$)", "$1$2")
    return c


def url_hash(col: Column) -> Column:
    """64-bit stable seen-set key (P2)."""
    return F.xxhash64(col)


def host_of(col: Column) -> Column:
    """Host extraction (P3) — JVM built-in parse_url."""
    return F.lower(F.parse_url(col, F.lit("HOST")))


def path_of(col: Column) -> Column:
    return F.coalesce(F.parse_url(col, F.lit("PATH")), F.lit("/"))


def host_bucket(host: Column, n_buckets: int = spec.DEFAULT_HOST_BUCKETS) -> Column:
    """Stable host partition bucket (P3) — frontier partitioning key."""
    return F.pmod(F.xxhash64(host), F.lit(n_buckets)).cast("int")


def url_salt(col: Column, n_salt: int = spec.DEFAULT_SALT) -> Column:
    """Per-URL salt for skewed-host fan-out (J4)."""
    return F.pmod(F.xxhash64(col), F.lit(n_salt)).cast("int")
