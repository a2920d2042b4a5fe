"""Custom stateful streaming operators (`applyInPandasWithState`).

The reference has no stateful streaming beyond Hudi's own key-dedup
(SURVEY §2.5 T7); this is the extension path for operators Structured
Streaming's built-in windowed aggs can't express — running per-key
accumulators, custom eviction, session state machines.

Pattern: `groupBy(key).applyInPandasWithState(fn, output, state,
"update", NoTimeout)` — state is an Arrow-typed tuple per key, the
function sees each micro-batch's rows for that key as pandas frames.
State lives in the executor state store (checkpointed), so a 1000-node
cluster scales state horizontally by key hash — no driver involvement.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def stream_stream_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_time_col: str,
    right_time_col: str,
    watermark_delay: str = "10 minutes",
    max_gap: str = "5 minutes",
    how: str = "inner",
) -> DataFrame:
    """Watermarked stream-stream equi-join: rows join when their event
    times are within `max_gap` of each other. Both sides carry a
    watermark plus the time-range condition, so each side's join state
    is EVICTED once the watermark passes — bounded state on an unbounded
    stream (an unconstrained stream-stream join would buffer both
    streams forever). State partitions by the join key across executor
    state stores; outer variants emit the unmatched row once its side's
    watermark expires."""
    from pyspark.sql import functions as F

    lw = left.withWatermark(left_time_col, watermark_delay).alias("l")
    rw = right.withWatermark(right_time_col, watermark_delay).alias("r")
    gap = f"interval {max_gap}"
    cond = None
    for k in on:
        c = F.col(f"l.{k}") == F.col(f"r.{k}")
        cond = c if cond is None else cond & c
    cond = (
        cond
        & (F.col(f"r.{right_time_col}") >= F.col(f"l.{left_time_col}") - F.expr(gap))
        & (F.col(f"r.{right_time_col}") <= F.col(f"l.{left_time_col}") + F.expr(gap))
    )
    j = lw.join(rw, cond, how)
    # clean output schema: one coalesced column per join key, right-side
    # non-key collisions suffixed _r
    sel = [F.coalesce(F.col(f"l.{k}"), F.col(f"r.{k}")).alias(k) for k in on]
    sel += [F.col(f"l.{c}") for c in left.columns if c not in on]
    sel += [
        F.col(f"r.{c}").alias(c if c not in left.columns else f"{c}_r")
        for c in right.columns
        if c not in on
    ]
    return j.select(*sel)


def stream_dedup_exact(
    stream_df: DataFrame,
    key_cols: list[str],
    event_time_col: str | None = None,
    watermark_delay: str = "10 minutes",
) -> DataFrame:
    """Streaming exact dedup: emit only the FIRST row seen per key —
    the ingest guard in front of an append-only sink (an upsert sink
    needs no dedup; preCombine supersedes it, SURVEY §2.5 T7).

    With `event_time_col`, uses `dropDuplicatesWithinWatermark` so the
    per-key state is EVICTED once the watermark passes — bounded state,
    the only formulation that survives an unbounded 100-TB/day stream.
    Without it, plain `dropDuplicates` keeps all keys forever (fine for
    bounded backfills). State is hash-partitioned by key across the
    executor state stores; no driver involvement."""
    if event_time_col is not None:
        return stream_df.withWatermark(
            event_time_col, watermark_delay
        ).dropDuplicatesWithinWatermark(key_cols)
    return stream_df.dropDuplicates(key_cols)


def running_totals(
    stream_df: DataFrame,
    key_col: str,
    value_col: str,
) -> DataFrame:
    """Per-key running (count, sum) over an unbounded stream: each
    micro-batch emits the key's updated totals (output mode `update`).

    The classic stateful-enrichment shape: downstream sinks (or a
    foreachBatch upsert into an engine table keyed on `key_col`) always
    hold the latest totals per key."""
    from pyspark.sql import types as T

    key_type = stream_df.schema[key_col].dataType
    out_schema = T.StructType(
        [
            T.StructField(key_col, key_type),
            T.StructField("n_events", T.LongType()),
            T.StructField("sum_value", T.DoubleType()),
        ]
    )
    state_schema = "n long, s double"

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        n, s = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            s += float(pdf[value_col].sum())
        state.update((n, s))
        yield pd.DataFrame({key_col: [key[0]], "n_events": [n], "sum_value": [s]})

    return stream_df.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def tws_available() -> bool:
    """True when Spark 4's transformWithStateInPandas can run: its
    state-server protocol needs google.protobuf in the Python env."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


def keyed_profile(
    stream_df: DataFrame,
    key_col: str,
    type_col: str,
    value_col: str,
    implementation: str = "auto",
) -> DataFrame:
    """Per-key running profile over an unbounded stream: emits
    (key, n_events, sum_value, n_types) after every micro-batch touching
    the key.

    Two implementations, same semantics:
    - "v2": Spark 4 `transformWithStateInPandas` (arbitrary stateful
      processing v2). A key's state is TWO differently-shaped variables
      — a ValueState (count/sum) and a MapState (per-type counts) —
      so MapState updates touch only the entries seen in the batch:
      per-key state IO is O(batch), not O(state). Requires
      google.protobuf in the executor Python env (`tws_available`).
    - "v1": `applyInPandasWithState` with the per-type counts folded
      into one serialized map column — rewritten whole per batch, the
      exact limitation v2 removes; correct at any scale, heavier for
      keys with huge type cardinality.
    "auto" picks v2 when the environment supports it."""
    from pyspark.sql import types as T

    key_type = stream_df.schema[key_col].dataType
    out_schema = T.StructType(
        [
            T.StructField(key_col, key_type),
            T.StructField("n_events", T.LongType()),
            T.StructField("sum_value", T.DoubleType()),
            T.StructField("n_types", T.LongType()),
        ]
    )
    if implementation == "auto":
        implementation = "v2" if tws_available() else "v1"

    if implementation == "v2":
        from pyspark.sql.streaming.stateful_processor import (
            StatefulProcessor,
            StatefulProcessorHandle,
        )

        class Profile(StatefulProcessor):
            def init(self, handle: StatefulProcessorHandle) -> None:
                self.totals = handle.getValueState("totals", "n long, s double")
                self.by_type = handle.getMapState("by_type", "t string", "c long")

            def handleInputRows(self, key, rows, timerValues):
                n, s = self.totals.get() if self.totals.exists() else (0, 0.0)
                for pdf in rows:
                    n += len(pdf)
                    s += float(pdf[value_col].sum())
                    for t, c in pdf.groupby(type_col).size().items():
                        prev = (
                            self.by_type.getValue((t,))[0]
                            if self.by_type.containsKey((t,))
                            else 0
                        )
                        self.by_type.updateValue((t,), (prev + int(c),))
                self.totals.update((n, s))
                n_types = sum(1 for _ in self.by_type.keys())
                yield pd.DataFrame(
                    {
                        key_col: [key[0]],
                        "n_events": [n],
                        "sum_value": [s],
                        "n_types": [n_types],
                    }
                )

            def close(self) -> None:
                pass

        return stream_df.groupBy(key_col).transformWithStateInPandas(
            Profile(),
            outputStructType=out_schema,
            outputMode="Update",
            timeMode="None",
        )

    state_schema = "n long, s double, types map<string, long>"

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        n, s, types = state.get if state.exists else (0, 0.0, {})
        types = dict(types or {})
        for pdf in pdfs:
            n += len(pdf)
            s += float(pdf[value_col].sum())
            for t, c in pdf.groupby(type_col).size().items():
                types[t] = types.get(t, 0) + int(c)
        state.update((n, s, types))
        yield pd.DataFrame(
            {
                key_col: [key[0]],
                "n_events": [n],
                "sum_value": [s],
                "n_types": [len(types)],
            }
        )

    return stream_df.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
