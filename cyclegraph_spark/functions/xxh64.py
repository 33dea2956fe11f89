"""Pure-Python XXH64 — single-node twin of Spark's ``F.xxhash64``.

Implements the public xxHash-64 algorithm (Yann Collet,
https://github.com/Cyan4973/xxHash — public spec) so the MinHash/SimHash
single-node oracles can reproduce Spark's JVM-side hashes exactly.

Spark's ``XxHash64`` expression semantics (sql/catalyst XxHash64 /
hash.scala, public Apache source):
  - carry = seed (42 by default);
  - for each child column, carry = hash(child, carry), where
      * StringType  → XXH64 over the UTF-8 bytes,
      * LongType    → XXH64 of the 8-byte little-endian value
                      (specialized ``hashLong``),
      * IntegerType → XXH64 of the 4-byte little-endian value
                      (specialized ``hashInt``).

So ``F.xxhash64(col_str, F.lit(i))`` == ``hash_int(i, xxh64_bytes(utf8, 42))``.

This is a TWIN (independent implementation from the public spec), not a
port of Spark code; parity is asserted empirically in tests/test_dedup.py.
"""

from __future__ import annotations

import struct

_M = (1 << 64) - 1
PRIME1 = 0x9E3779B185EBCA87
PRIME2 = 0xC2B2AE3D27D4EB4F
PRIME3 = 0x165667B19E3779F9
PRIME4 = 0x85EBCA77C2B2AE63
PRIME5 = 0x27D4EB2F165667C5


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M


def _round(acc: int, inp: int) -> int:
    acc = (acc + inp * PRIME2) & _M
    acc = _rotl(acc, 31)
    return (acc * PRIME1) & _M


def _merge_round(acc: int, val: int) -> int:
    acc ^= _round(0, val)
    return ((acc * PRIME1) + PRIME4) & _M


def _avalanche(h: int) -> int:
    h ^= h >> 33
    h = (h * PRIME2) & _M
    h ^= h >> 29
    h = (h * PRIME3) & _M
    h ^= h >> 32
    return h


def xxh64_bytes(data: bytes, seed: int = 42) -> int:
    """Standard XXH64 over a byte string (unsigned 64-bit result)."""
    seed &= _M
    n = len(data)
    pos = 0
    if n >= 32:
        v1 = (seed + PRIME1 + PRIME2) & _M
        v2 = (seed + PRIME2) & _M
        v3 = seed
        v4 = (seed - PRIME1) & _M
        while pos + 32 <= n:
            a, b, c, d = struct.unpack_from("<QQQQ", data, pos)
            v1, v2, v3, v4 = _round(v1, a), _round(v2, b), _round(v3, c), _round(v4, d)
            pos += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M
        h = _merge_round(h, v1)
        h = _merge_round(h, v2)
        h = _merge_round(h, v3)
        h = _merge_round(h, v4)
    else:
        h = (seed + PRIME5) & _M
    h = (h + n) & _M
    while pos + 8 <= n:
        (k1,) = struct.unpack_from("<Q", data, pos)
        h ^= _round(0, k1)
        h = (_rotl(h, 27) * PRIME1 + PRIME4) & _M
        pos += 8
    if pos + 4 <= n:
        (k1,) = struct.unpack_from("<I", data, pos)
        h ^= (k1 * PRIME1) & _M
        h = (_rotl(h, 23) * PRIME2 + PRIME3) & _M
        pos += 4
    while pos < n:
        h ^= (data[pos] * PRIME5) & _M
        h = (_rotl(h, 11) * PRIME1) & _M
        pos += 1
    return _avalanche(h)


def xxh64_long(value: int, seed: int = 42) -> int:
    """XXH64 of an 8-byte little-endian long (Spark's ``hashLong``)."""
    return xxh64_bytes(struct.pack("<q", value), seed)


def xxh64_int(value: int, seed: int = 42) -> int:
    """XXH64 of a 4-byte little-endian int (Spark's ``hashInt``)."""
    return xxh64_bytes(struct.pack("<i", value), seed)


def _to_signed(u: int) -> int:
    return u - (1 << 64) if u >= (1 << 63) else u


def spark_xxhash64_str_int(s: str, i: int, seed: int = 42) -> int:
    """Twin of ``F.xxhash64(string_col, F.lit(i))`` (signed 64-bit)."""
    return _to_signed(xxh64_int(i, xxh64_bytes(s.encode("utf-8"), seed)))


def spark_xxhash64_str(s: str, seed: int = 42) -> int:
    """Twin of ``F.xxhash64(string_col)`` (signed 64-bit)."""
    return _to_signed(xxh64_bytes(s.encode("utf-8"), seed))
