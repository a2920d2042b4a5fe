"""Engine-portable 60-bit hash.

``xxhash64`` is the fast path for Spark-internal shuffles/buckets, but it
exists only in Spark — a DuckDB oracle cannot reproduce it. For operators
whose OUTPUT depends on hash values (MinHash signatures, SimHash bit
votes, IVF seed selection), we use the first 15 hex chars (60 bits) of
md5: both engines compute md5 identically, and 60 bits always fits a
positive BIGINT, so

    Spark : conv(substring(md5(x), 1, 15), 16, 10) :: long
    DuckDB: CAST('0x' || substring(md5(x), 1, 15) AS BIGINT)

are bit-equal (verified: 'hello world' -> 426544247714475757 on both).
md5 costs ~2x xxhash64 per call; operators take a ``portable`` flag so
the fast variant stays available when no differential check is needed.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# DuckDB-dialect twin; .format(x=<sql expr>) it into oracle SQL.
PORTABLE_HASH60_SQL = "CAST('0x' || substring(md5({x}), 1, 15) AS BIGINT)"


def portable_hash60(col: Column | str) -> Column:
    """60-bit non-negative hash reproducible on any engine with md5."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def portable_hash60_py(value: str | bytes) -> int:
    """Driver-side twin of `portable_hash60` for one string: the first
    15 hex chars of md5 as a non-negative int — bit-equal to the Spark
    column (and the DuckDB SQL) by construction, both being plain md5.
    Used by probe paths that already hold their few hundred rows on the
    driver (see minhash_index.minhash_probe), where launching a Spark
    job to evaluate a pure function of driver literals is one avoidable
    shuffle per probe."""
    import hashlib

    data = value.encode("utf-8") if isinstance(value, str) else value
    return int(hashlib.md5(data).hexdigest()[:15], 16)


# ---------------------------------------------------------------------
# Driver-side twin of Spark's `xxhash64` (XXH64, default seed 42).
# Bucket probes (text index term → partition bucket) need the SAME hash
# the producer wrote with, for a handful of driver-resident strings —
# launching a Spark job (createDataFrame + collect) to evaluate a pure
# function of a few literals is one avoidable job per search. Verified
# bit-equal against F.xxhash64 in tests/test_operators.py.
# ---------------------------------------------------------------------

_M64 = (1 << 64) - 1
_XP1 = 0x9E3779B185EBCA87
_XP2 = 0xC2B2AE3D27D4EB4F
_XP3 = 0x165667B19E3779F9
_XP4 = 0x85EBCA77C2B2AE63
_XP5 = 0x27D4EB2F165667C5


def _rotl64(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M64


def xxhash64_py(value: str | bytes, seed: int = 42) -> int:
    """Spark's ``F.xxhash64(col)`` for one driver-side string: XXH64
    over the UTF-8 bytes with Spark's default seed 42, returned as the
    same SIGNED 64-bit value Spark yields (so ``% n`` matches
    ``F.pmod(F.xxhash64(c), n)`` exactly — Python's ``%`` is
    non-negative for positive n, like pmod)."""
    data = value.encode("utf-8") if isinstance(value, str) else value
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _XP1 + _XP2) & _M64
        v2 = (seed + _XP2) & _M64
        v3 = seed & _M64
        v4 = (seed - _XP1) & _M64
        while i + 32 <= n:
            k = int.from_bytes(data[i : i + 8], "little")
            v1 = (_rotl64((v1 + k * _XP2) & _M64, 31) * _XP1) & _M64
            k = int.from_bytes(data[i + 8 : i + 16], "little")
            v2 = (_rotl64((v2 + k * _XP2) & _M64, 31) * _XP1) & _M64
            k = int.from_bytes(data[i + 16 : i + 24], "little")
            v3 = (_rotl64((v3 + k * _XP2) & _M64, 31) * _XP1) & _M64
            k = int.from_bytes(data[i + 24 : i + 32], "little")
            v4 = (_rotl64((v4 + k * _XP2) & _M64, 31) * _XP1) & _M64
            i += 32
        h = (
            _rotl64(v1, 1) + _rotl64(v2, 7) + _rotl64(v3, 12) + _rotl64(v4, 18)
        ) & _M64
        for v in (v1, v2, v3, v4):
            h ^= (_rotl64((v * _XP2) & _M64, 31) * _XP1) & _M64
            h = (h * _XP1 + _XP4) & _M64
    else:
        h = (seed + _XP5) & _M64
    h = (h + n) & _M64
    while i + 8 <= n:
        k = int.from_bytes(data[i : i + 8], "little")
        h ^= (_rotl64((k * _XP2) & _M64, 31) * _XP1) & _M64
        h = (_rotl64(h, 27) * _XP1 + _XP4) & _M64
        i += 8
    if i + 4 <= n:
        h ^= (int.from_bytes(data[i : i + 4], "little") * _XP1) & _M64
        h = (_rotl64(h, 23) * _XP2 + _XP3) & _M64
        i += 4
    while i < n:
        h ^= (data[i] * _XP5) & _M64
        h = (_rotl64(h, 11) * _XP1) & _M64
        i += 1
    h ^= h >> 33
    h = (h * _XP2) & _M64
    h ^= h >> 29
    h = (h * _XP3) & _M64
    h ^= h >> 32
    return h - (1 << 64) if h >= (1 << 63) else h
