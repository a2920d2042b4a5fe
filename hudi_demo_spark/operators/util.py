"""Shared operator utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Fan a narrow scan out to the session's parallelism before CPU-heavy
    per-row work (regex/tokenize/hash/vector math). Small fixture files
    arrive as one input split, which would serialize the whole map phase
    on one core; at cluster scale inputs already have many splits and this
    is a no-op."""
    target = min_partitions or df.sparkSession._sc.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
