"""Event-time operators: merge as-of join, gap sessionization, tumbling
windows. The operators a training-data / telemetry pipeline needs that
plain SQL joins don't express directly.

All three are single-shuffle compositions of built-in DataFrame ops — no
Python UDFs, no crossJoin, no range explosion:

- `as_of_join`: the classic union + window carry-forward merge-asof.
  Both sides shuffle ONCE on the join key; within each key the rows are
  ordered by timestamp and the latest right-side row is carried forward
  with `last(ignorenulls)`. Cost is O(n log n) per key — at 100 TB this
  beats an inequality range join (which Spark would plan as a broadcast
  nested loop) by orders of magnitude, and skew is bounded by key
  cardinality, same as any keyed window.
- `sessionize`: lag + running sum over one keyed window (the standard
  gap-based session assignment).
- `session_stats`: one groupBy over the sessionized output.

Reference parity: the reference has no event-time operators (its Hudi
demos dedup by preCombine instead — SURVEY §2.5 T7); these are the
BASELINE.json-mandated pipeline extensions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: list[str] | None = None,
    strict: bool = True,
    tolerance_seconds: float | None = None,
) -> DataFrame:
    """For each left row, attach the latest right row of the same key with
    ``right_ts < left_ts`` (``strict=True``) or ``<=`` (``strict=False``).

    Right-side columns come back prefixed ``asof_`` (including
    ``asof_<right_ts>``); rows with no match keep them NULL. With
    ``tolerance_seconds`` the match is dropped when the gap exceeds it.

    Ties on ``right_ts`` within a key are resolved by whichever right row
    sorts last in the union order — pre-dedup the right side to one row
    per (key, ts) for full determinism.

    Implementation: union both sides tagged with a side marker, one window
    per key ordered by (ts, side), carry the last non-null right-side
    payload forward, keep left rows. One shuffle total; no range join.
    """
    keys = [on] if isinstance(on, str) else list(on)
    rcols = right_cols if right_cols is not None else [
        c for c in right.columns if c not in keys
    ]
    if right_ts not in rcols:
        rcols = [right_ts, *rcols]

    payload = F.struct(*[F.col(c).alias(c) for c in rcols])
    # strict: at equal ts the left row must sort BEFORE the right row so
    # the carry-forward cannot see it; non-strict: right first.
    l_side, r_side = (0, 1) if strict else (1, 0)
    # SQL join semantics: a NULL key or NULL timestamp on the right can
    # never be "the latest prior row" — drop them, otherwise the window's
    # NULLS-FIRST ordering would carry a null-ts payload into every left
    # row, and NULL keys would match each other (unlike any equi-join).
    r_valid = F.col(right_ts).isNotNull()
    for k in keys:
        r_valid = r_valid & F.col(k).isNotNull()
    r = right.filter(r_valid).select(
        *[F.col(k) for k in keys],
        F.col(right_ts).alias("__asof_ts"),
        payload.alias("__asof_payload"),
        F.lit(r_side).alias("__asof_side"),
    )
    null_payload = F.lit(None).cast(r.schema["__asof_payload"].dataType)
    l = left.select(
        "*",
        F.col(left_ts).alias("__asof_ts"),
        null_payload.alias("__asof_payload"),
        F.lit(l_side).alias("__asof_side"),
    )
    merged = l.unionByName(r, allowMissingColumns=True)
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col("__asof_ts").asc(), F.col("__asof_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = merged.withColumn(
        "__asof_match", F.last("__asof_payload", ignorenulls=True).over(w)
    )
    out = carried.filter(F.col("__asof_side") == l_side)  # left rows only
    if tolerance_seconds is not None:
        gap = F.col("__asof_ts").cast("double") - F.col(
            "__asof_match"
        )[right_ts].cast("double")
        out = out.withColumn(
            "__asof_match",
            F.when(gap <= F.lit(float(tolerance_seconds)), F.col("__asof_match")),
        )
    for c in rcols:
        out = out.withColumn(f"asof_{c}", F.col("__asof_match")[c])
    return out.drop("__asof_ts", "__asof_payload", "__asof_side", "__asof_match")


def _epoch(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("double")


def sessionize(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    gap_seconds: float,
    tiebreak: str | None = None,
) -> DataFrame:
    """Assign gap-based session ids per key: a new session starts when the
    time since the previous event of the same key exceeds ``gap_seconds``.
    Adds ``session_id`` (1-based, per key). One keyed window, one shuffle.

    Rows with a NULL key or NULL timestamp are dropped: a session
    assignment is undefined without an event time, and keeping them would
    both fabricate sessions and shift the numbering of real ones."""
    df = df.filter(F.col(key_col).isNotNull() & F.col(ts_col).isNotNull())
    order = [F.col(ts_col).asc()] + ([F.col(tiebreak).asc()] if tiebreak else [])
    w = Window.partitionBy(key_col).orderBy(*order)
    prev = F.lag(F.col(ts_col)).over(w)
    new_session = F.when(
        prev.isNull() | (_epoch(ts_col) - _epoch(prev) > float(gap_seconds)), 1
    ).otherwise(0)
    run = Window.partitionBy(key_col).orderBy(*order).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return df.withColumn("session_id", F.sum(new_session).over(run))


def session_stats(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    gap_seconds: float,
    value_col: str | None = None,
    tiebreak: str | None = None,
) -> DataFrame:
    """Per-session rollup: (key, session_id, n_events, session_start,
    session_end, duration_ms[, sum_value])."""
    s = sessionize(df, key_col, ts_col, gap_seconds, tiebreak)
    aggs = [
        F.count("*").alias("n_events"),
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        # exact integer milliseconds — float rounding of an epoch diff can
        # straddle a half-up boundary and break cross-engine parity
        F.floor(
            (F.unix_micros(F.max(ts_col)) - F.unix_micros(F.min(ts_col))) / 1000
        ).alias("duration_ms"),
    ]
    if value_col is not None:
        aggs.append(F.round(F.sum(value_col), 4).alias("sum_value"))
    return s.groupBy(key_col, "session_id").agg(*aggs)


def range_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    lo_seconds: float = 0.0,
    hi_seconds: float = 3600.0,
    bucket_seconds: float | None = None,
) -> DataFrame:
    """Keyed interval join: left row L matches right rows R of the same
    key with ``R.right_ts ∈ (L.left_ts + lo, L.left_ts + hi]``.

    Naively this is a theta join Spark plans as a broadcast nested loop
    (or a full per-key cross product) — quadratic per key. Instead both
    sides are co-partitioned on (key, time-bucket): the right side lands
    in one bucket of width `bucket` (default hi−lo), the left interval
    spans at most ⌈(hi−lo)/bucket⌉+1 buckets and is exploded across them,
    so the join is a plain equi-join on (key, bucket) with an exact range
    filter after. Cost is linear in matches; skew follows key×bucket, not
    key. Column names (other than the key) must be disjoint."""
    keys = [on] if isinstance(on, str) else list(on)
    clash = (set(left.columns) & set(right.columns)) - set(keys)
    if clash:
        raise ValueError(f"range_join: overlapping non-key columns {sorted(clash)}")
    lo_us = int(lo_seconds * 1_000_000)
    hi_us = int(hi_seconds * 1_000_000)
    w_us = int((bucket_seconds or (hi_seconds - lo_seconds)) * 1_000_000)
    if w_us <= 0:
        raise ValueError("range_join: bucket width must be positive")
    l_us = F.unix_micros(F.col(left_ts))
    r_us = F.unix_micros(F.col(right_ts))
    l2 = left.withColumn(
        "__rj_b",
        F.explode(
            F.sequence(
                F.floor((l_us + F.lit(lo_us)) / F.lit(w_us)),
                F.floor((l_us + F.lit(hi_us)) / F.lit(w_us)),
            )
        ),
    )
    r2 = right.withColumn("__rj_b", F.floor(r_us / F.lit(w_us)))
    return (
        l2.join(r2, [*keys, "__rj_b"])
        .filter((r_us > l_us + F.lit(lo_us)) & (r_us <= l_us + F.lit(hi_us)))
        .drop("__rj_b")
    )


def tumbling_window_agg(
    df: DataFrame,
    ts_col: str,
    duration: str,
    group_cols: list[str],
    aggs: list[Column],
) -> DataFrame:
    """Tumbling event-time window aggregate (batch form of the Structured
    Streaming windowed agg): (window_start, *group_cols, *aggs)."""
    return (
        df.groupBy(F.window(ts_col, duration).alias("__w"), *group_cols)
        .agg(*aggs)
        .withColumn("window_start", F.col("__w.start"))
        .drop("__w")
    )


def sliding_window_agg(
    df: DataFrame,
    ts_col: str,
    duration: str,
    slide: str,
    group_cols: list[str],
    aggs: list[Column],
) -> DataFrame:
    """Sliding (hopping) event-time window aggregate: each event lands in
    duration/slide overlapping windows (window_start, *group_cols,
    *aggs). Spark's window() explodes the assignments map-side; the agg
    is one keyed shuffle, map-side combinable — the fan-out costs rows,
    never an extra shuffle."""
    return (
        df.groupBy(F.window(ts_col, duration, slide).alias("__w"), *group_cols)
        .agg(*aggs)
        .withColumn("window_start", F.col("__w.start"))
        .drop("__w")
    )


def gap_fill(
    df: DataFrame,
    group_cols: list[str],
    ts_col: str,
    value_col: str,
    step_s: int,
    agg: str = "avg",
    fill: str = "locf",
) -> DataFrame:
    """Regularize an event stream onto a fixed `step_s`-second grid per
    group — the hypertable `time_bucket_gapfill` shape: bucket-aggregate
    the observed values (`agg` ∈ avg/sum/min/max/count), generate every
    bucket between each group's first and last observation, and fill the
    empty ones. Returns (*group_cols, bucket, <value_col>) with `bucket`
    the epoch-second bucket start.

    `fill`: 'locf' carries the last observation forward (leading gaps
    stay NULL); 'linear' interpolates between the surrounding
    observations (edge gaps fall back to the nearest observation);
    'zero' fills 0; 'none' leaves gaps NULL.

    Scale shape: one keyed aggregation shuffle for the buckets, a
    per-group bounds aggregate (rows = groups), a grid explode whose
    size is the OUTPUT size, and one window per group for the fill —
    no crossJoin, no driver loop. Dense-grid windows over very long
    ranges partition by group; salt the group key upstream if one
    group's grid exceeds a partition."""
    aggs = {
        "avg": F.avg, "sum": F.sum, "min": F.min, "max": F.max,
        "count": F.count,
    }
    if agg not in aggs:
        raise ValueError(f"gap_fill agg must be one of {sorted(aggs)}")
    if fill not in ("locf", "linear", "zero", "none"):
        raise ValueError("gap_fill fill must be locf|linear|zero|none")
    step = int(step_s)
    # NTZ timestamps can't cast straight to double; route through
    # TIMESTAMP (session-tz interpretation — run under UTC for
    # wall-clock bucket labels)
    epoch = F.col(ts_col).cast("timestamp").cast("double")
    bucket = (F.floor(epoch / step) * step).cast("long")
    obs = (
        df.groupBy(*group_cols, bucket.alias("bucket"))
        .agg(aggs[agg](value_col).cast("double").alias("__v"))
    )
    bounds = obs.groupBy(*group_cols).agg(
        F.min("bucket").alias("__mn"), F.max("bucket").alias("__mx")
    )
    grid = bounds.select(
        *group_cols,
        F.explode(
            F.sequence(F.col("__mn"), F.col("__mx"), F.lit(step))
        ).alias("bucket"),
    )
    g = grid.join(obs, [*group_cols, "bucket"], "left")
    w = Window.partitionBy(*group_cols).orderBy("bucket")
    wp = w.rowsBetween(Window.unboundedPreceding, 0)
    if fill == "locf":
        filled = F.last("__v", ignorenulls=True).over(wp)
    elif fill == "zero":
        filled = F.coalesce(F.col("__v"), F.lit(0.0))
    elif fill == "none":
        filled = F.col("__v")
    else:  # linear
        pt = F.when(
            F.col("__v").isNotNull(),
            F.struct(F.col("bucket").alias("b"), F.col("__v").alias("v")),
        )
        # the next observation is a running last-non-null over the
        # DESCENDING twin window — an unbounded-FOLLOWING ignorenulls
        # frame re-scans to the partition end per row (O(n²) in grid
        # length; measured 20x on a month-long grid), the descending
        # preceding frame keeps running state (O(n))
        wdesc = (
            Window.partitionBy(*group_cols)
            .orderBy(F.col("bucket").desc())
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        g = g.withColumn(
            "__p", F.last(pt, ignorenulls=True).over(wp)
        ).withColumn("__n", F.last(pt, ignorenulls=True).over(wdesc))
        prev, nxt = F.col("__p"), F.col("__n")
        lerp = prev["v"] + (nxt["v"] - prev["v"]) * (
            (F.col("bucket") - prev["b"]) / (nxt["b"] - prev["b"])
        )
        filled = F.coalesce(F.col("__v"), lerp, prev["v"], nxt["v"])
    return g.select(
        *group_cols, "bucket", filled.alias(value_col)
    )


def trailing_window_agg(
    df: DataFrame,
    group_cols: list[str],
    ts_col: str,
    value_col: str,
    range_s: int,
    aggs: tuple[str, ...] = ("count", "avg"),
) -> DataFrame:
    """Trailing time-range aggregates per key — the moving-average /
    rolling-count shape (`RANGE BETWEEN range_s PRECEDING AND CURRENT
    ROW` over event time): every row gains one column per requested agg
    (count/avg/sum/min/max of `value_col`, named `<agg>_<value_col>`)
    computed over the last `range_s` seconds of its group.

    One window (= one keyed shuffle + sort) computes every requested
    aggregate; the RANGE frame slides with running state, never
    re-scanning the trail per row. Groups are the parallelism unit —
    a single giant group serializes; sessionize or sub-key first."""
    allowed = {"count": F.count, "avg": F.avg, "sum": F.sum,
               "min": F.min, "max": F.max}
    bad = [a for a in aggs if a not in allowed]
    if bad:
        raise ValueError(f"trailing_window_agg aggs {bad} not in {sorted(allowed)}")
    epoch = F.col(ts_col).cast("timestamp").cast("double")
    w = (
        Window.partitionBy(*group_cols)
        .orderBy(epoch)
        .rangeBetween(-int(range_s), 0)
    )
    out = df
    for a in aggs:
        col = allowed[a]("*" if a == "count" else value_col).over(w)
        out = out.withColumn(f"{a}_{value_col}", col)
    return out
