"""Bit-parity of the pure-Python XXH64 reference (fixtures/xxh64.py) with
Spark's ``xxhash64`` — the primitive the membership_cuckoo VALUES oracle
needs to reproduce url hashes without running Spark."""

from __future__ import annotations

from pyspark.sql import functions as F

from csxj_crawler_spark.fixtures.xxh64 import to_signed, xxh64_long, xxh64_str

# golden vectors produced by org.apache.spark.sql.catalyst.expressions.XXH64
# directly (javac/java against the pyspark jars; seed 42 = Spark's default)
_STR_GOLDEN = {
    "": 0x98B1582B0977E704,
    "a": 0x88E4FE59ADF7B0CC,
    "abc": 0x13C1D910702770E6,
    "message digest": 0x85FEA12F652E06E9,
    "abcdefghijklmnopqrstuvwxyz": 0xD2ADB2B633915FD4,
    "1234567890" * 8: 0x5021173AF538AE2D,
    "http://lesoir-0.example/news/art-00001 some longer text body to cross 32 bytes": 0xF746B4DF6973DFF3,
}
_LONG_GOLDEN = {
    0: 0xB71B47EBDA15746C,
    1: 0x9ED50FD59358D232,
    -1: 0x358AE035BFB46FD2,
    123456789: 0x2F64F8F3490DEF3F,
    -987654321: 0x4B6DFE36F6785F12,
    4102030405060708090: 0xCABACCBB3530A969,
}


def test_golden_vectors():
    for s, h in _STR_GOLDEN.items():
        assert xxh64_str(s) == h
    for v, h in _LONG_GOLDEN.items():
        assert xxh64_long(v) == h


def test_spark_parity_strings_and_longs(spark):
    strs = list(_STR_GOLDEN) + ["héllo wörld ünïcode", "x" * 1000, "\n\t|'"]
    df = spark.createDataFrame([(i, s) for i, s in enumerate(strs)], "i long, s string")
    rows = df.select("i", "s", F.xxhash64("s").alias("hs"), F.xxhash64("i").alias("hi")).collect()
    for r in rows:
        assert r["hs"] == to_signed(xxh64_str(r["s"]))
        assert r["hi"] == to_signed(xxh64_long(r["i"]))
