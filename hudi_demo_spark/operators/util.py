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
    serializing a scan on one core).

    "The session's parallelism" is the SESSION's shuffle-partition conf,
    not the shared SparkContext's defaultParallelism: gates/pipelines
    that pin a cloned session to N shuffle partitions (the deployment
    knob for bounded incremental work — see plans.queries._pinned_session)
    must not have every spread() fan their micro-batches back out to
    the full core count. Measured on engine_minhash_index's CDC
    refresh: ten 32-task repartition stages inside one 8-pinned
    refresh, pure scheduling overhead. Capped at defaultParallelism:
    spread exists to occupy CORES with map work, so a session running
    Spark's stock 200-partition default (e.g. a bare driver session)
    must not repartition a narrow scan into 200 micro-tasks — more
    slices than cores only adds scheduling. On this repo's unpinned
    sessions conf == defaultParallelism, so behavior is unchanged."""
    spark = df.sparkSession
    target = min_partitions
    if target is None:
        target = spark._sc.defaultParallelism
        try:
            target = min(
                target, int(spark.conf.get("spark.sql.shuffle.partitions"))
            )
        except Exception:
            pass
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


def rows_df(spark, rows, schema, rows_per_slice: int = 10_000):
    """``spark.createDataFrame(rows, schema)`` minus the
    defaultParallelism-wide Python scan. createDataFrame parallelizes a
    driver list into ``sc.defaultParallelism`` slices, so EVERY action
    over the relation schedules that many Python-worker tasks — 32 on
    this box — to serve a handful of rows (measured: 32 tasks/0.49 s
    warm vs 1 task/0.20 s for the same 1500-row relation). Slice count
    scales with the row count instead, capped at defaultParallelism, so
    genuinely large row sets still parallelize. Values, schema and
    semantics are exactly createDataFrame's — the rows ride through the
    same applySchemaToPythonRDD path, only the slice count differs.

    Use for driver-resident probe/status/metadata row sets on hot query
    paths. For scalar-typed rows a VALUES ``local_relation`` (below) is
    cheaper still (no job at all) UNLESS the relation is consulted by
    many actions with long literal strings — see the constant-folding
    note at minhash_index.minhash_probe."""
    sc = spark.sparkContext
    n = max(1, min(sc.defaultParallelism, len(rows) // rows_per_slice + 1))
    return spark.createDataFrame(sc.parallelize(rows, n), schema)


def local_relation(spark, rows, schema, max_rows: int = 10_000):
    """A driver-side LocalRelation for a SMALL row set — the cheap twin
    of ``spark.createDataFrame`` for probe/offset tables on hot query
    paths. PySpark's createDataFrame builds a Python-RDD-backed plan
    whose every action schedules a defaultParallelism-wide scan job
    through a Python worker (measured ~0.9 s per action for 50 rows on
    local[32]); a parsed ``VALUES`` list is a pure JVM LocalRelation —
    actions on it (and broadcast builds from it) run driver-local with
    NO Spark job (~30 ms). String cells ride as ``unhex('..')`` so no
    SQL escaping rules apply to any content; all cells are cast to the
    target schema's exact types. Supported cell types: the scalar
    string/integral/float/bool/date-less set probes use — anything
    else (or a row set past `max_rows`) falls back to createDataFrame.

    `rows` may be Row objects or tuples, ordered as `schema.fields`.
    """
    from pyspark.sql import types as T

    if isinstance(schema, str):
        schema = T._parse_datatype_string(schema)
    supported = (
        T.StringType, T.IntegerType, T.LongType, T.ShortType,
        T.ByteType, T.DoubleType, T.FloatType, T.BooleanType,
    )

    def ok(dt):
        return isinstance(dt, supported) or (
            isinstance(dt, T.ArrayType)
            and isinstance(dt.elementType, supported)
        )

    if len(rows) > max_rows or not rows or not all(
        ok(f.dataType) for f in schema.fields
    ):
        return rows_df(spark, rows, schema)

    def cell(v, dt):
        if v is None:
            return "NULL"
        if isinstance(dt, T.ArrayType):
            inner = ",".join(cell(x, dt.elementType) for x in v)
            return f"array({inner})" if inner else "array()"
        if isinstance(dt, T.StringType):
            return f"unhex('{v.encode('utf-8').hex()}')"
        if isinstance(dt, T.BooleanType):
            return "true" if v else "false"
        if isinstance(dt, (T.DoubleType, T.FloatType)):
            return f"'{v!r}'"  # shortest-roundtrip repr, cast below
        return str(int(v))

    dts = [f.dataType for f in schema.fields]
    values = ",".join(
        "(" + ",".join(cell(v, dt) for v, dt in zip(r, dts)) + ")"
        for r in rows
    )
    def col_expr(i, f):
        c = f"CAST(col{i + 1} AS {f.dataType.simpleString()})"
        if f.nullable:
            # nullif(x, NULL) is x with nullable=true — VALUES infers
            # tighter non-null flags than the caller's schema declares
            c = f"nullif({c}, NULL)"
        return f"{c} AS `{f.name}`"

    # Names, order, types and values match createDataFrame(rows, schema)
    # exactly; the one divergence is that a NON-nullable target field
    # comes back nullable (CAST output is nullable and Spark SQL has no
    # assert-not-null surface) — irrelevant to the join/aggregate
    # consumers this helper exists for.
    casts = ",".join(col_expr(i, f) for i, f in enumerate(schema.fields))
    return spark.sql(f"SELECT {casts} FROM VALUES {values}")
