"""Dataset profiling — the pre-training sanity pass over numeric columns,
plus sketch-backed frequency profiling (heavy hitters)."""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def heavy_hitters(
    df: DataFrame, key_col: str, support: float
) -> DataFrame:
    """(key, freq): every key whose frequency is >= support × N, with
    its EXACT count — the frequent-items profile (hot tokens, hot join
    keys, hot domains) a pipeline reads before choosing salting keys or
    stop lists.

    Two passes, neither of which shuffles raw rows:

    1. Candidate mining — a Misra-Gries summary with m = ceil(1/support)
       counters per partition (Arrow-batched `mapInPandas`; each batch
       folds in as a vectorized value_counts merge, the mergeable-
       summaries rule of Agarwal et al. 2013: add, then subtract the
       (m+1)-th largest and drop non-positives). MG undercounts any key
       by at most n_p/(m+1) within a partition, and a key with global
       frequency >= support × N has frequency >= support × n_p in at
       least one partition (pigeonhole), so with 1/(m+1) < support the
       candidate union PROVABLY contains every true heavy hitter.
       Output is <= m keys per partition — broadcast-sized at any data
       scale.
    2. Exact recount — a broadcast left-semi join prunes the table to
       candidate keys only, then one map-side-combinable count. The
       final filter `freq >= support × N` makes the result exact: the
       superset from pass 1 costs only recount width, never recall.

    The full-vocabulary groupBy this replaces shuffles O(distinct keys);
    this shuffles O(candidates) = O(partitions / support)."""
    if not (0.0 < support < 1.0):
        raise ValueError("heavy_hitters: support must be in (0, 1)")
    m = math.ceil(1.0 / support)
    key_field = df.schema[key_col]

    def _mg(batches):
        import pandas as pd

        acc = pd.Series(dtype="int64")
        for pdf in batches:
            vc = pdf[key_col].value_counts()
            acc = acc.add(vc, fill_value=0)
            if len(acc) > m:
                cut = acc.nlargest(m + 1).iloc[-1]
                acc = (acc - cut)[lambda s: s > 0]
        # list() keeps the key dtype object-typed so an EMPTY partition
        # doesn't surface as an int64 RangeIndex that Arrow refuses to
        # cast to the declared key type
        yield pd.DataFrame({key_col: list(acc.index)})

    from pyspark.sql.types import StructType

    cand = (
        df.select(key_col)
        .mapInPandas(_mg, StructType([key_field]))
        .distinct()
    )
    n_total = df.count()
    return (
        df.join(F.broadcast(cand), key_col, "left_semi")
        .groupBy(key_col)
        .agg(F.count("*").cast("long").alias("freq"))
        .filter(F.col("freq") >= F.lit(support * n_total))
    )


def profile_numeric(
    df: DataFrame, cols: list[str], approx: bool = True
) -> DataFrame:
    """Per-column (n, n_null, n_distinct, min, max, median).

    DEFAULT is the approx path (HLL++ distinct, quantile-sketch
    median): ONE aggregate scan, bounded executor memory — the only
    formulation that survives a 100 TB column. Exact mode
    (`approx=False`) buffers each column's values for a sort-based
    percentile — a memory cliff at scale — and exists as the OPT-IN
    for small data where engine-portable, oracle-exact numbers matter.

    Shape (exact mode): one `groupBy(col).count()` per column feeds
    EVERYTHING — n (Σcnt), nulls, exact distinct (count of non-null
    rows), min/max, and the exact median via `percentile(col, 0.5,
    cnt)`, the frequency-weighted form that is value-identical to
    percentile over raw rows. The dedup/count runs in the codegen hash
    aggregate (parallel, map-side combined); percentile's
    object-hash-map buffer then holds one (value, weight) pair per
    DISTINCT value instead of per row, so its single-reducer merge is
    bounded by column cardinality, not row count. One pruned scan per
    column, no separate COUNT(DISTINCT) pass. (A fully parallel
    256-bucket rank-select was measured at sf0.1 and REJECTED: it
    removes the single-reducer stage but adds ~8 tiny stages per
    column, netting +35% wall at this scale — and exact mode is the
    documented small-data opt-in; the 100 TB path is approx=True.)"""
    if not cols:
        raise ValueError("profile_numeric: cols must be non-empty")
    if approx:
        # the 100-TB path (default): HLL++ distinct counts and
        # quantile-sketch medians fold into the SAME single wide
        # aggregate as the other stats — one scan total, no sort, no
        # per-column passes, bounded memory per group.
        exprs = [F.count("*").alias("n")]
        for c in cols:
            exprs += [
                F.sum(F.col(c).isNull().cast("long")).alias(f"__nn_{c}"),
                F.round(F.min(c).cast("double"), 4).alias(f"__mn_{c}"),
                F.round(F.max(c).cast("double"), 4).alias(f"__mx_{c}"),
                F.round(
                    F.expr(f"approx_percentile(`{c}`, 0.5, 10000)").cast("double"),
                    4,
                ).alias(f"__md_{c}"),
                F.approx_count_distinct(c, rsd=0.02).alias(f"__nd_{c}"),
            ]
        wide = df.agg(*exprs)
        outs = [
            wide.select(
                F.lit(c).alias("col"),
                "n",
                F.col(f"__nn_{c}").alias("n_null"),
                F.col(f"__nd_{c}").alias("n_distinct"),
                F.col(f"__mn_{c}").alias("min_val"),
                F.col(f"__mx_{c}").alias("max_val"),
                F.col(f"__md_{c}").alias("median"),
            )
            for c in cols
        ]
        out = outs[0]
        for o in outs[1:]:
            out = out.unionByName(o)
        return out
    outs = []
    for c in cols:
        counts = df.groupBy(c).agg(F.count("*").alias("__cnt"))
        outs.append(
            counts.agg(
                # coalesce: SUM over the empty groupBy result is NULL,
                # but n must be 0 on an empty input (as count(*) was)
                F.coalesce(
                    F.sum("__cnt"), F.lit(0).cast("long")
                ).alias("n"),
                F.coalesce(
                    F.sum(F.when(F.col(c).isNull(), F.col("__cnt"))),
                    F.lit(0).cast("long"),
                ).alias("n_null"),
                F.count(F.col(c)).alias("n_distinct"),
                F.round(F.min(c).cast("double"), 4).alias("min_val"),
                F.round(F.max(c).cast("double"), 4).alias("max_val"),
                F.round(
                    F.expr(f"percentile(`{c}`, 0.5, __cnt)").cast("double"),
                    4,
                ).alias("median"),
            ).select(
                F.lit(c).alias("col"),
                "n", "n_null", "n_distinct",
                "min_val", "max_val", "median",
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out
