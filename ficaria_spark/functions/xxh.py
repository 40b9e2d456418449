"""Pure-Python XXH64 compatible with Spark's ``F.xxhash64``.

xxHash64 is a public, spec-documented algorithm (Yann Collet,
github.com/Cyan4973/xxHash); Spark implements the same spec in
``org.apache.spark.sql.catalyst.expressions.XXH64`` with known-answer tests.
This driver-side twin exists so the exact-value oracles for the
xxhash64-based dedup queries can be generated WITHOUT running Spark
(tests/test_xxh.py asserts bit-parity against ``F.xxhash64`` for every input
shape the operators use).

Spark semantics being mirrored:
* default seed 42;
* multi-argument / array hashing chains: the running hash is the seed for
  the next element (nulls leave the hash unchanged);
* strings hash their UTF-8 bytes; longs use the 8-byte primitive path;
  int literals use the 4-byte primitive path.
"""

from __future__ import annotations

from functools import lru_cache

_M = (1 << 64) - 1
_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5

SPARK_DEFAULT_SEED = 42


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M


def _fmix(h: int) -> int:
    h ^= h >> 33
    h = (h * _P2) & _M
    h ^= h >> 29
    h = (h * _P3) & _M
    h ^= h >> 32
    return h


def _round(acc: int, inp: int) -> int:
    acc = (acc + inp * _P2) & _M
    return (_rotl(acc, 31) * _P1) & _M


def _merge_round(h: int, v: int) -> int:
    h ^= _round(0, v)
    return (h * _P1 + _P4) & _M


def xxh64_bytes(data: bytes, seed: int) -> int:
    """Spec XXH64 over a byte string (unsigned 64-bit result)."""
    seed &= _M
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M
        v2 = (seed + _P2) & _M
        v3 = seed
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


def xxh64_long(value: int, seed: int) -> int:
    """Spark's 8-byte primitive path (== spec XXH64 of the LE bytes)."""
    seed &= _M
    h = (seed + _P5 + 8) & _M
    h ^= _round(0, value & _M)
    h = (_rotl(h, 27) * _P1 + _P4) & _M
    return _fmix(h)


def xxh64_int(value: int, seed: int) -> int:
    """Spark's 4-byte primitive path (ints/shorts/bytes/booleans)."""
    seed &= _M
    h = (seed + _P5 + 4) & _M
    h ^= ((value & 0xFFFFFFFF) * _P1) & _M
    h = (_rotl(h, 23) * _P2 + _P3) & _M
    return _fmix(h)


def _signed(u: int) -> int:
    return u - (1 << 64) if u >= (1 << 63) else u


@lru_cache(maxsize=1 << 20)
def spark_xxhash64_str(s: str, seed: int = SPARK_DEFAULT_SEED) -> int:
    """``F.xxhash64(string_col)`` twin — signed 64-bit like Spark LONG."""
    return _signed(xxh64_bytes(s.encode("utf-8"), seed))


def spark_xxhash64_str_int(s: str, extra: int,
                           seed: int = SPARK_DEFAULT_SEED) -> int:
    """``F.xxhash64(string_col, F.lit(int))`` twin: the string hash seeds the
    int-literal hash (Spark chains children left to right)."""
    h = xxh64_bytes(s.encode("utf-8"), seed)
    return _signed(xxh64_int(extra, h))


def spark_xxhash64_long_array(values, seed: int = SPARK_DEFAULT_SEED) -> int:
    """``F.xxhash64(array<long> col)`` twin: elements chain via the long path."""
    h = seed & _M
    for v in values:
        h = xxh64_long(int(v), h)
    return _signed(h)
