"""Incrementally-maintained derived tables (materialized rollups).

The DeltaStreamer-style pattern the reference's streaming demos gesture
at (continuous source → derived Hudi table): a rollup table is refreshed
from its source's INCREMENTAL read — each refresh processes only the
commits since the last one and folds them into the rollup with an
additive upsert. At 100 TB this is the difference between re-aggregating
the world per refresh and touching just the new slice: refresh cost
scales with data ARRIVED, not data STORED.

Scope: additive aggregates (count/sum — avg derivable as sum/count)
over INSERT-ONLY sources. Updates/deletes in the source would need
retractions (old-version negatives); refresh detects non-insert commits
in the window and raises rather than silently drifting.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from hudi_demo_spark.engine.config import (
    COMMIT_TIME_META,
    PARTITION_PATH_META,
    RECORD_KEY_META,
)
from hudi_demo_spark.engine.timeline import Timeline

_OFFSET_PROP = "derived.last_refresh_instant"
_ALLOWED = {"insert", "bootstrap_full", "bootstrap_metadata"}


def create_rollup(
    engine,
    source: str,
    name: str,
    group_cols: list[str],
    sum_cols: list[str],
):
    """Define `name` as an incrementally-maintained rollup of `source`:
    per group, a row count and one sum per `sum_cols` entry. Returns the
    rollup's TableConfig; call `refresh_rollup` to fold in new commits."""
    return engine.create_table(
        name,
        record_key=group_cols,
        partition_by=None,
        props={
            "derived.source": source,
            "derived.group_cols": ",".join(group_cols),
            "derived.sum_cols": ",".join(sum_cols),
        },
    )


def refresh_rollup(engine, name: str) -> dict | None:
    """Fold source commits since the last refresh into the rollup:
    incremental read → partial aggregate of JUST the new rows →
    key-joined additive combine with the current rollup state → upsert.
    Returns the commit meta, or None when the source has no new commits.
    """
    cfg = engine._resolve(name)
    source = cfg.props["derived.source"]
    group_cols = cfg.props["derived.group_cols"].split(",")
    sum_cols = [c for c in cfg.props["derived.sum_cols"].split(",") if c]
    src_cfg = engine._resolve(source)
    tl = Timeline(src_cfg.path)
    begin = cfg.props.get(_OFFSET_PROP)
    end = tl.last_instant()
    if end is None or begin == end:
        return None
    window = [
        m for m in tl.instants()
        if (begin is None or m["instant"] > begin) and m["instant"] <= end
    ]
    bad = [m["operation"] for m in window if m["operation"] not in _ALLOWED]
    if bad:
        raise ValueError(
            f"rollup {name}: source window contains non-insert operations "
            f"{sorted(set(bad))} — additive maintenance needs retractions; "
            "rebuild the rollup instead"
        )
    delta = engine.read_incremental(source, begin=begin, end=end)
    partial = delta.groupBy(*group_cols).agg(
        F.count("*").alias("n_rows"),
        *[F.sum(c).alias(f"sum_{c}") for c in sum_cols],
    )
    meta = {RECORD_KEY_META, PARTITION_PATH_META, COMMIT_TIME_META}
    try:
        current = engine.read(name).drop(*meta)
    except Exception:
        current = None
    if current is not None and current.take(1):
        agg_cols = ["n_rows"] + [f"sum_{c}" for c in sum_cols]
        cur = current.select(
            *group_cols, *[F.col(c).alias(f"__old_{c}") for c in agg_cols]
        )
        combined = partial.join(cur, group_cols, "full_outer").select(
            *group_cols,
            *[
                (
                    F.coalesce(F.col(c), F.lit(0))
                    + F.coalesce(F.col(f"__old_{c}"), F.lit(0))
                ).alias(c)
                for c in agg_cols
            ],
        )
    else:
        combined = partial
    out = engine.upsert(combined, name)
    cfg.props[_OFFSET_PROP] = end
    cfg.save()
    return out
