"""Local stand-in for the driver's DuckDB oracle comparison.

Runs a ``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB over
the same parquet dir, then compares row count, column names, and an
order-insensitive value hash — stricter than the driver so that passing here
implies passing there.
"""

from __future__ import annotations

import datetime as _dt
import decimal as _dec
import hashlib
import math

import duckdb


def _norm(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if math.isinf(v):
            return "Inf" if v > 0 else "-Inf"
        return f"{v:.9g}"
    if isinstance(v, _dec.Decimal):
        return f"{float(v):.9g}"
    if isinstance(v, _dt.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, (bytes, bytearray)):
        return "0x" + bytes(v).hex()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm(x) for x in v) + "]"
    return str(v)


def rows_fingerprint(cols: list[str], rows: list[tuple]) -> str:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("|".join(_norm(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()


def register_views(con: "duckdb.DuckDBPyConnection", sf_dir: str) -> None:
    import glob
    import os

    for p in glob.glob(f"{sf_dir}/*.parquet"):
        name = os.path.basename(p)[: -len(".parquet")]
        con.execute(f"CREATE OR REPLACE VIEW {name} AS SELECT * FROM '{p}'")


def compare_one(spark, sf_dir: str, fn, sql: str | None) -> dict:
    sdf = fn(spark, sf_dir)
    srows = [tuple(r) for r in sdf.collect()]
    scols = sdf.columns
    out = {"spark_rows": len(srows), "ok": True, "detail": ""}
    if sql is None:
        out["oracle"] = "rows-only"
        return out
    con = duckdb.connect()
    register_views(con, sf_dir)
    cur = con.execute(sql)
    dcols = [d[0] for d in cur.description]
    drows = cur.fetchall()
    out["duck_rows"] = len(drows)
    if sorted(scols) != sorted(dcols):
        out["ok"] = False
        out["detail"] = f"columns differ: spark={sorted(scols)} duck={sorted(dcols)}"
        return out
    if len(srows) != len(drows):
        out["ok"] = False
        out["detail"] = f"row count differ: spark={len(srows)} duck={len(drows)}"
        return out
    hs = rows_fingerprint(scols, srows)
    hd = rows_fingerprint(dcols, drows)
    if hs != hd:
        out["ok"] = False
        # find a sample difference for debugging
        sset = {
            "|".join(_norm(r[i]) for i in sorted(range(len(scols)), key=lambda i: scols[i]))
            for r in srows
        }
        dset = {
            "|".join(_norm(r[i]) for i in sorted(range(len(dcols)), key=lambda i: dcols[i]))
            for r in drows
        }
        only_s = list(sset - dset)[:3]
        only_d = list(dset - sset)[:3]
        out["detail"] = f"value hash differ; spark-only={only_s} duck-only={only_d}"
    return out
