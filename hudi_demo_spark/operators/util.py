"""Shared operator utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame

_SIZE_SUFFIX = {"b": 1, "k": 1 << 10, "m": 1 << 20, "g": 1 << 30,
                "t": 1 << 40}


def _parse_bytes(v: str) -> int:
    s = str(v).strip().lower()
    for suf in ("kb", "mb", "gb", "tb", "k", "m", "g", "t", "b"):
        if s.endswith(suf):
            return int(float(s[: -len(suf)])) * _SIZE_SUFFIX[suf[0]]
    return int(float(s))


def spread(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Fan a narrow scan out to the session's parallelism before CPU-heavy
    per-row work (regex/tokenize/hash/vector math). Small fixture files
    arrive as one input split, which would serialize the whole map phase
    on one core; at cluster scale inputs already have many splits and this
    is a no-op.

    The split estimate comes from the optimizer's size statistics
    (driver-side metadata: file sizes / maxPartitionBytes) — NOT from
    `df.rdd.getNumPartitions()`, which forces a plan→RDD conversion on
    every call. Unknown sizes err toward repartitioning (the repartition
    of an already-wide input is the rarer, cheaper mistake than
    serializing a scan on one core)."""
    spark = df.sparkSession
    target = min_partitions or spark._sc.defaultParallelism
    try:
        size = int(
            df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
        )
        max_split = _parse_bytes(
            spark.conf.get("spark.sql.files.maxPartitionBytes", "128m")
        )
        # relations without real statistics (DSv2 / python data sources)
        # report defaultSizeInBytes — a near-Long.MAX sentinel, not a
        # measurement. Anything past 1 PB is that sentinel in practice
        # (a genuine 100 TB scan is still under it): treat as unknown
        # and err toward the repartition, per the contract above.
        if size < (1 << 50) and size // max(1, max_split) + 1 >= target:
            return df  # input already fans out to enough splits
    except Exception:
        pass
    return df.repartition(target)
