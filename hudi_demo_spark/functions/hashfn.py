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
