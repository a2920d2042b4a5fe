"""Data generators — Spark-first, fully distributed (no row loops).

- `rate_stream_source` (S16) — the Flink datagen source of
  hudi0.13_flink1.15/.../TestStreamingMOR.java:23-36: rows-per-second rate,
  bounded sequence user_id 1→N, random length-5 strings. Structured
  Streaming `rate` source + column transforms.
- `trips_datagen` (S18) — java-client/.../HoodieExampleDataGenerator.java:
  100-183 re-expressed as `spark.range` + vectorized rand/uuid (the row
  loop disappears; scale = add partitions).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TRIP_PARTITIONS = ["2020/01/01", "2020/01/02", "2020/01/03"]


def _rand_str(col_seed, length: int = 5):
    # deterministic pseudo-random lowercase string of fixed length
    chars = F.array(*[F.lit(c) for c in "abcdefghijklmnopqrstuvwxyz"])
    return F.concat(
        *[
            F.element_at(chars, (F.pmod(F.hash(col_seed, F.lit(i)), F.lit(26)) + 1).cast("int"))
            for i in range(length)
        ]
    )


def rate_stream_source(
    spark: SparkSession, rows_per_second: int = 10, max_user_id: int = 10_000
) -> DataFrame:
    """Streaming frame with schema (user_id string, product string,
    amount string) — the TestStreamingMOR datagen table."""
    rate = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", rows_per_second)
        .load()
    )
    uid = (F.pmod(F.col("value"), F.lit(max_user_id)) + 1).cast("long")
    return rate.select(
        uid.cast("string").alias("user_id"),
        _rand_str(F.col("value") * 2 + 1).alias("product"),
        _rand_str(F.col("value") * 2).alias("amount"),
        F.col("timestamp").alias("ts"),
    )


def trips_datagen(
    spark: SparkSession, n: int, commit_time: str = "0", seed: int = 46474747
) -> DataFrame:
    """Seeded random trips (uuid key, 3 fixed date partitions, random
    lat/lon/fare) — HoodieExampleDataGenerator semantics, vectorized."""
    parts = F.array(*[F.lit(p) for p in TRIP_PARTITIONS])
    df = spark.range(n)
    return df.select(
        F.lit(commit_time).cast("long").alias("ts"),
        F.expr("uuid()").alias("uuid"),
        F.concat(F.lit("rider-"), F.lit(commit_time)).alias("rider"),
        F.concat(F.lit("driver-"), F.lit(commit_time)).alias("driver"),
        (F.rand(seed) * 90).alias("begin_lat"),
        (F.rand(seed + 1) * 90).alias("begin_lon"),
        (F.rand(seed + 2) * 90).alias("end_lat"),
        (F.rand(seed + 3) * 90).alias("end_lon"),
        (F.rand(seed + 4) * 100).alias("fare"),
        F.element_at(parts, (F.pmod(F.col("id"), F.lit(3)) + 1).cast("int")).alias(
            "partitionpath"
        ),
    )
