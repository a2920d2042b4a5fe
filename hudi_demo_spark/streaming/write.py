"""Streaming ingest into engine tables (SURVEY §2.5).

Reference parity: the Flink streaming MOR write
(hudi0.13_flink1.15/.../TestStreamingMOR.java:38-59) — continuous insert
from a datagen source with checkpoint-driven commits and inline
compaction — becomes Structured Streaming `foreachBatch`:

- each micro-batch is one engine commit (the Flink checkpoint→instant
  mapping, T2);
- exactly-once: the commit records `batch_id`; replayed batches (after a
  checkpoint recovery) are skipped because their batch_id is already on
  the timeline — idempotent foreachBatch, the standard Spark pattern;
- inline compaction fires through the engine's `compact.inline` props
  every N delta commits (T5 — TestBatchMOR.java:40-46);
- `bounded=True` → `trigger(availableNow)`, else processing-time
  micro-batches (T3 — HudiDemo.java:56 bounded flag).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery


def stream_write(
    engine,
    table: str,
    stream_df: DataFrame,
    checkpoint: str,
    mode: str = "insert",  # insert (W7) | upsert (W6)
    trigger_seconds: float | None = None,
    bounded: bool = False,
) -> StreamingQuery:
    cfg = engine._resolve(table)

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        from hudi_demo_spark.engine.timeline import Timeline

        if batch_id in Timeline(cfg.path).committed_batch_ids():
            return  # replay after recovery — already committed
        if batch_df.isEmpty():
            return
        if mode == "upsert":
            engine.upsert(batch_df, cfg, batch_id=batch_id)
        else:
            engine.insert(batch_df, cfg, batch_id=batch_id)

    writer = (
        stream_df.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
    )
    if bounded:
        writer = writer.trigger(availableNow=True)
    elif trigger_seconds:
        writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
    return writer.start()
