"""Deterministic sampling and dataset splitting for training pipelines.

RNG-based sampling (`df.sample`) is not reproducible across engines,
partitionings, or reruns — a training pipeline needs the SAME split for
the same key every time, on any engine. The standard fix is hash-based
assignment: bucket each key by a stable hash of its id and carve the
bucket space into splits. Pure map-side expression work — no shuffle, no
state, and a row's split never changes when the dataset grows.

md5 is used (not xxhash64) so the assignment is bit-identical in any
engine that can compute md5 of the same string — the DuckDB oracle
checks the split row-by-row.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def hash_bucket(key: Column | str, buckets: int = 16) -> Column:
    """Stable bucket in [0, buckets) from the md5 of the key's string
    form. buckets must divide 16**k for exact uniformity; 16 uses the
    first hex nibble."""
    c = F.col(key) if isinstance(key, str) else key
    nibbles = 1
    space = 16
    while space < buckets:
        nibbles += 1
        space *= 16
    return (
        F.conv(F.substring(F.md5(c.cast("string")), 1, nibbles), 16, 10)
        .cast("int")
        % buckets
    )


def hash_sample(df: DataFrame, key: str, fraction_16ths: int) -> DataFrame:
    """Deterministic ~fraction_16ths/16 sample by key hash (same rows on
    every engine and every run)."""
    return df.filter(hash_bucket(key, 16) < fraction_16ths)


def weighted_mix(
    df: DataFrame,
    key: str,
    group_col: str,
    rates_256ths: dict[str, int],
    default_256ths: int = 256,
) -> DataFrame:
    """Domain mixing: deterministically sample each group (source /
    domain / language) at its own rate — the standard pretraining-mixture
    op ("keep 10% of CommonCrawl, 100% of Wikipedia"). Rates are in
    256ths so the assignment is an exact integer comparison on a 2-hex-
    nibble bucket of the stable key hash: reproducible on any engine, no
    RNG, map-side only, and a row's fate never changes as data grows.

    Unknown groups keep `default_256ths` (256 = keep all)."""
    for g, r in rates_256ths.items():
        if not 0 <= r <= 256:
            raise ValueError(f"rate for {g!r} must be in [0, 256]")
    b = hash_bucket(key, 256)
    rate = F.lit(default_256ths)
    for g, r in rates_256ths.items():
        rate = F.when(F.col(group_col) == g, F.lit(r)).otherwise(rate)
    return df.filter(b < rate)


def train_val_test_split(
    df: DataFrame,
    key: str,
    val_16ths: int = 2,
    test_16ths: int = 2,
) -> DataFrame:
    """Adds a `split` column ('train' | 'val' | 'test') keyed on the
    stable hash bucket: the last `test_16ths` buckets are test, the
    `val_16ths` before them val, the rest train. NULL keys get a NULL
    split (consistent with `hash_sample`, which excludes them) — they
    must never silently leak into the evaluation splits."""
    if val_16ths < 0 or test_16ths < 0 or val_16ths + test_16ths >= 16:
        raise ValueError(
            "val_16ths + test_16ths must leave at least one train bucket"
        )
    b = hash_bucket(key, 16)
    train_hi = 16 - val_16ths - test_16ths
    return df.withColumn(
        "split",
        F.when(b.isNull(), F.lit(None).cast("string"))
        .when(b < train_hi, F.lit("train"))
        .when(b < 16 - test_16ths, F.lit("val"))
        .otherwise(F.lit("test")),
    )
