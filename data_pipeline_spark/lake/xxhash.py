"""Driver-side twin of Spark's ``xxhash64`` expression (XXH64, seed 42).

``LakeTable`` buckets rows by ``pmod(xxhash64(key), n_buckets)``. A point
lookup only needs the bucket NUMBER — launching a Spark job
(``spark.range(1).select(xxhash64(...))``) to hash one key is pure driver
latency. This module reimplements XXH64 (the public xxHash spec, as wired
in Spark's ``XxHash64`` expression: UTF-8 bytes for strings, the 8-byte
little-endian value via ``hashLong`` for integral types, seed 42) so bucket
routing is a pure-Python call; parity with the JVM is pinned by
tests/test_replay_e2e.py::test_python_xxhash64_matches_jvm.
"""

from __future__ import annotations

_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5
_M = (1 << 64) - 1

SPARK_XXHASH_SEED = 42


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M


def _fmix(h: int) -> int:
    h ^= h >> 33
    h = (h * _P2) & _M
    h ^= h >> 29
    h = (h * _P3) & _M
    h ^= h >> 32
    return h


def _round(acc: int, k: int) -> int:
    acc = (acc + k * _P2) & _M
    return (_rotl(acc, 31) * _P1) & _M


def _merge_round(h: int, acc: int) -> int:
    h ^= _round(0, acc)
    return (h * _P1 + _P4) & _M


def xxh64(data: bytes, seed: int = SPARK_XXHASH_SEED) -> int:
    """Unsigned XXH64 of ``data``."""
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M
        v2 = (seed + _P2) & _M
        v3 = seed & _M
        v4 = (seed - _P1) & _M
        while i + 32 <= n:
            v1 = _round(v1, int.from_bytes(data[i:i + 8], "little"))
            v2 = _round(v2, int.from_bytes(data[i + 8:i + 16], "little"))
            v3 = _round(v3, int.from_bytes(data[i + 16:i + 24], "little"))
            v4 = _round(v4, int.from_bytes(data[i + 24:i + 32], "little"))
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M
        for v in (v1, v2, v3, v4):
            h = _merge_round(h, v)
    else:
        h = (seed + _P5) & _M
    h = (h + n) & _M
    while i + 8 <= n:
        h ^= _round(0, int.from_bytes(data[i:i + 8], "little"))
        h = (_rotl(h, 27) * _P1 + _P4) & _M
        i += 8
    if i + 4 <= n:
        h ^= (int.from_bytes(data[i:i + 4], "little") * _P1) & _M
        h = (_rotl(h, 23) * _P2 + _P3) & _M
        i += 4
    while i < n:
        h ^= (data[i] * _P5) & _M
        h = (_rotl(h, 11) * _P1) & _M
        i += 1
    return _fmix(h)


def _hash_long(value: int, seed: int) -> int:
    """Spark's ``XXH64.hashLong``: one 8-byte stripe, no tail."""
    h = (seed + _P5 + 8) & _M
    h ^= _round(0, value & _M)
    h = (_rotl(h, 27) * _P1 + _P4) & _M
    return _fmix(h)


def spark_xxhash64(value, seed: int = SPARK_XXHASH_SEED) -> int:
    """Signed 64-bit result matching ``F.xxhash64(lit(value))``.

    Strings hash their UTF-8 bytes; ints hash as 8-byte longs (Spark widens
    all integral types to long inside ``XxHash64``); bytes hash raw.
    """
    if isinstance(value, str):
        h = xxh64(value.encode("utf-8"), seed)
    elif isinstance(value, (bytes, bytearray, memoryview)):
        h = xxh64(bytes(value), seed)
    elif isinstance(value, int):
        h = _hash_long(value, seed)
    else:
        raise TypeError(f"unsupported key type for driver-side xxhash64: {type(value)}")
    return h - (1 << 64) if h >= (1 << 63) else h
