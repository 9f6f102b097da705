"""Pure-Python XXH64 — an independent reference implementation of the
public xxHash64 algorithm (https://github.com/Cyan4973/xxHash, BSD-2), used
by oracle builders that must reproduce Spark's ``xxhash64(...)`` column
values WITHOUT running Spark (Spark's default seed is 42; its LongType path
is the canonical 8-byte little-endian hash, its StringType path the
canonical hash of the UTF-8 bytes).  Bit-parity with Spark is locked by
tests/test_xxh64.py over fixture strings and longs.

Plain-int implementation (no numpy): this runs once per oracle build over a
few hundred fixture rows, so clarity and independence beat speed.
"""

from __future__ import annotations

import struct

_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5
_M = (1 << 64) - 1

SPARK_SEED = 42


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M


def _round(acc: int, inp: int) -> int:
    acc = (acc + inp * _P2) & _M
    return (_rotl(acc, 31) * _P1) & _M


def _merge_round(h: int, v: int) -> int:
    h ^= _round(0, v)
    return (h * _P1 + _P4) & _M


def _fmix(h: int) -> int:
    h ^= h >> 33
    h = (h * _P2) & _M
    h ^= h >> 29
    h = (h * _P3) & _M
    h ^= h >> 32
    return h


def xxh64(data: bytes, seed: int = SPARK_SEED) -> int:
    """Canonical XXH64 of ``data`` with ``seed``; returns unsigned 64-bit."""
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M
        v2 = (seed + _P2) & _M
        v3 = seed & _M
        v4 = (seed - _P1) & _M
        while i + 32 <= n:
            (w1, w2, w3, w4) = struct.unpack_from("<QQQQ", data, i)
            v1 = _round(v1, w1)
            v2 = _round(v2, w2)
            v3 = _round(v3, w3)
            v4 = _round(v4, w4)
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M
        for v in (v1, v2, v3, v4):
            h = _merge_round(h, v)
    else:
        h = (seed + _P5) & _M
    h = (h + n) & _M
    while i + 8 <= n:
        (w,) = struct.unpack_from("<Q", data, i)
        h ^= _round(0, w)
        h = (_rotl(h, 27) * _P1 + _P4) & _M
        i += 8
    if i + 4 <= n:
        (w,) = struct.unpack_from("<I", data, i)
        h ^= (w * _P1) & _M
        h = (_rotl(h, 23) * _P2 + _P3) & _M
        i += 4
    while i < n:
        h ^= (data[i] * _P5) & _M
        h = (_rotl(h, 11) * _P1) & _M
        i += 1
    return _fmix(h)


def xxh64_str(s: str, seed: int = SPARK_SEED) -> int:
    """Spark ``xxhash64(string_col)``: canonical hash of the UTF-8 bytes."""
    return xxh64(s.encode("utf-8"), seed)


def xxh64_long(v: int, seed: int = SPARK_SEED) -> int:
    """Spark ``xxhash64(long_col)``: Spark's hashLong equals the canonical
    hash of the value's 8 little-endian two's-complement bytes."""
    return xxh64(struct.pack("<q", v), seed)


def to_signed(h: int) -> int:
    """Unsigned 64-bit → the signed long Spark's LongType column carries."""
    return h - (1 << 64) if h >= (1 << 63) else h
