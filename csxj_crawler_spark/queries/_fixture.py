"""Shared tiny crawl fixture for the driver-contract crawl/payload queries.

The driver's oracle runs on its own TPC-H-ish tables; the crawl engine's
tables (web_graph / seeds / robots / images_captions) are OURS, generated
deterministically (seed=42, no external data) into a temp dir.  Oracle SQL
for these queries is emitted as literal ``VALUES`` computed by the
*independent* pure-Python reference simulator / numpy codecs — so the DuckDB
side never touches Spark code paths.
"""

from __future__ import annotations

import os
import tempfile

from csxj_crawler_spark.fixtures import generator

_TINY = os.path.join(tempfile.gettempdir(), "csxj_tiny_fixture_v3")
N_PAGES = 120
N_SEEDS = 4


def tiny_fixture_dir() -> str:
    marker = os.path.join(_TINY, ".complete")
    if not os.path.exists(marker):
        generator.generate(_TINY, n_pages=N_PAGES, seed=42, n_seeds_per_source=N_SEEDS)
        with open(marker, "w") as f:
            f.write("ok")
    return _TINY


def sql_quote(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, (int, float)):
        return repr(v)
    s = str(v).replace("'", "''")
    return f"'{s}'"


def values_sql(cols: list[tuple[str, str]], rows: list[tuple]) -> str:
    """Build ``SELECT ... FROM (VALUES ...) t(...)`` with explicit casts."""
    names = ", ".join(c for c, _ in cols)
    sel = ", ".join(f"CAST({c} AS {typ}) AS {c}" for c, typ in cols)
    if not rows:
        # empty relation with the right schema
        casts = ", ".join(f"CAST(NULL AS {typ}) AS {c}" for c, typ in cols)
        return f"SELECT {casts} WHERE 1=0"
    vals = ",\n".join("(" + ", ".join(sql_quote(v) for v in r) + ")" for r in rows)
    return f"SELECT {sel} FROM (VALUES\n{vals}\n) AS t({names})"
