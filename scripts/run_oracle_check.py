"""Run the full queries()/oracle_sql() battery locally, mimicking the driver.

Usage: python scripts/run_oracle_check.py [sf_dir] [only_query_prefix]
Prints one line per query; exits nonzero if any oracled query mismatches.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as E
from csxj_crawler_spark.oracle_check import compare_one
from csxj_crawler_spark.session import get_spark


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    prefix = sys.argv[2] if len(sys.argv) > 2 else ""
    spark = get_spark(app="oracle-check")
    qs = E.queries()
    sqls = E.oracle_sql()
    bad = 0
    for name, fn in qs.items():
        if prefix and not name.startswith(prefix):
            continue
        t0 = time.time()
        try:
            res = compare_one(spark, sf_dir, fn, sqls.get(name))
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL {name}: EXCEPTION {exc!r}")
            bad += 1
            continue
        dt = time.time() - t0
        tag = "ok  " if res["ok"] else "FAIL"
        if not res["ok"]:
            bad += 1
        extra = res.get("detail", "")
        oracle = res.get("oracle", "sql")
        print(f"{tag} {name:34s} rows={res['spark_rows']:<7d} {oracle:9s} {dt:6.1f}s {extra}")
    spark.stop()
    print(f"\n{'ALL OK' if bad == 0 else f'{bad} FAILURES'} / {len(qs)} queries")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
