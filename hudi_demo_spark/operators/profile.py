"""Dataset profiling — the pre-training sanity pass over numeric columns."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_numeric(df: DataFrame, cols: list[str]) -> DataFrame:
    """Per-column (n, n_null, n_distinct, min, max, median). Exact
    percentile (sort-based) so results are engine-portable, unlike
    approximate sketches.

    One narrow agg per column, NOT one wide agg: several COUNT(DISTINCT
    x) over different columns in a single aggregate make Catalyst plan
    an Expand (rows × #distinct-groups through the shuffle) — measured
    2-3× slower than per-column column-pruned scans."""
    if not cols:
        raise ValueError("profile_numeric: cols must be non-empty")
    outs = []
    for c in cols:
        outs.append(
            df.agg(
                F.lit(c).alias("col"),
                F.count("*").alias("n"),
                F.sum(F.col(c).isNull().cast("long")).alias("n_null"),
                F.count_distinct(F.col(c)).alias("n_distinct"),
                F.round(F.min(c).cast("double"), 4).alias("min_val"),
                F.round(F.max(c).cast("double"), 4).alias("max_val"),
                F.round(
                    F.expr(f"percentile(`{c}`, 0.5)").cast("double"), 4
                ).alias("median"),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out
