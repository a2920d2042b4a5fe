"""Batch sources (SURVEY §2.1).

- `load_table` — the fixture loader used by queries/bench; normalizes the
  TIMESTAMP(NANOS) `events.ts` column (Spark has no nanos timestamp: read
  as long via `nanosAsLong`, truncate to micros exactly like DuckDB does).
- JDBC source (S9) — common/.../DfUtils.scala:17-19.
- JDBC subquery pushdown (S10) — SyncCommentsAcrossClusters.scala:52,126-139:
  the whole SELECT ships to the RDBMS as a parenthesized `dbtable`.
- CSV source (S17) — hudi0.13_flink1.15/.../Configurations.java:95-109.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def _normalize_timestamps(df: DataFrame) -> DataFrame:
    """Cast TIMESTAMP_NTZ columns to TIMESTAMP (session tz is UTC, so the
    wall clock is reinterpreted as the same UTC instant DuckDB assumes).
    The fixture parquet stores plain `timestamp[us]` (no tz); every operator
    here is written against TIMESTAMP semantics (`unix_micros`, `F.window`,
    literal casts), so normalize once at the source."""
    ntz = [f.name for f in df.schema.fields if isinstance(f.dataType, T.TimestampNTZType)]
    if not ntz:
        return df
    return df.withColumns({c: F.col(c).cast("timestamp") for c in ntz})


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    path = f"{sf_dir.rstrip('/')}/{name}.parquet"
    if name == "events":
        # older fixture generations wrote events.ts as TIMESTAMP(NANOS) —
        # unsupported by the vectorized parquet reader; read as long and
        # truncate to microseconds (identical to DuckDB's nanos→micros
        # truncation). Current generations write timestamp[us] and skip this.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        try:
            df = spark.read.parquet(path)
        finally:
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "false")
        if dict(df.dtypes).get("ts") == "bigint":
            # `div` = exact integer division. `/` would go through DOUBLE,
            # and nanosecond epochs (~1.7e18) exceed double's exact-integer
            # range (2^53) — the roundtrip is off by ±1 µs for ~0.1% of
            # values, which diverges from DuckDB's exact truncation.
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        return _normalize_timestamps(df)
    return _normalize_timestamps(spark.read.parquet(path))


def load_tables(spark: SparkSession, sf_dir: str, names=None) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in (names or TABLES)}


def register_views(spark: SparkSession, sf_dir: str, names=None) -> None:
    for n, df in load_tables(spark, sf_dir, names).items():
        df.createOrReplaceTempView(n)


def jdbc_source(spark: SparkSession, options: dict[str, str]) -> DataFrame:
    """S9 — `spark.read.format("jdbc").options(map).load()`."""
    return spark.read.format("jdbc").options(**options).load()


def jdbc_subquery_source(
    spark: SparkSession, url: str, subquery: str, alias: str = "a", **options
) -> DataFrame:
    """S10 — full query pushed to the RDBMS via parenthesized dbtable."""
    return (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", f"({subquery}) {alias}")
        .options(**options)
        .load()
    )


def csv_source(
    spark: SparkSession, path: str, schema: T.StructType | str, **options
) -> DataFrame:
    """S17 — explicit-schema CSV (no inference scan)."""
    return spark.read.schema(schema).options(**options).csv(path)


def json_source(
    spark: SparkSession, path: str, schema: T.StructType | str, **options
) -> DataFrame:
    """JSON-lines source with a pinned schema — inference would scan the
    whole dataset once before the real read, which at 100 TB doubles the
    IO; with the schema given, Jackson parses straight into the pinned
    columns and unmentioned fields are never materialized."""
    return spark.read.schema(schema).options(**options).json(path)


def orc_source(spark: SparkSession, path: str, **options) -> DataFrame:
    """ORC source (native vectorized reader — same pushdown/pruning
    machinery as parquet: predicate pushdown into stripe/row-group
    indexes, column projection)."""
    return spark.read.options(**options).orc(path)
