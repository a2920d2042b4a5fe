"""Streaming / continuous reads from engine tables (S21, T4).

Reference parity: Hudi streaming read (`READ_AS_STREAMING`,
`READ_START_COMMIT` — hudi0.13_flink1.15/.../HudiDemo.java:38-39,
TableDDLDemo.java:13). Two forms:

- `IncrementalPuller` — the DeltaStreamer-style micro-batch pull loop:
  each call to `pull()` returns the rows committed since the last pulled
  instant (exact `(begin, end]` incremental read) and advances the
  offset. This is the honest engine-level change feed: driver-side
  offset, executor-side scan, no data through the driver.
- `stream_read` — a Structured Streaming file source over the table's
  data directory (append-only change feed). Correct for MOR delta flow
  and insert-only COW tables (matching the reference's usage, which
  streams an insert-only table); COW update rewrites would re-emit
  carried rows, so the puller is the general-purpose path.
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

from hudi_demo_spark.engine.config import DATA_DIR
from hudi_demo_spark.engine.timeline import Timeline


class IncrementalPuller:
    def __init__(self, engine, table: str, start_commit: str | None = None):
        self.engine = engine
        self.cfg = engine._resolve(table)
        self.offset = start_commit or ""

    def pull(self) -> DataFrame | None:
        """Rows committed in (offset, latest]; None when caught up."""
        tl = Timeline(self.cfg.path)
        last = tl.last_instant()
        if last is None or last <= self.offset:
            return None
        df = self.engine.read_incremental(
            self.cfg, begin=self.offset or None, end=last
        )
        self.offset = last
        return df


class CdcPuller:
    """CDC micro-batch pull loop: each `pull()` returns the per-key
    CHANGES (insert/update/delete with `_change_type`, after-images —
    before-image for deletes) committed since the last pulled instant,
    and advances the offset. The streaming form of `Engine.read_cdc`
    (Hudi incremental `format=cdc`), for downstream sync jobs that need
    deletes — which an append-only row feed cannot express."""

    def __init__(self, engine, table: str, start_commit: str | None = None,
                 images: str = "after"):
        self.engine = engine
        self.cfg = engine._resolve(table)
        self.offset = start_commit or ""
        self.images = images

    def pull(self) -> DataFrame | None:
        """Changes in (offset, latest]; None when caught up."""
        tl = Timeline(self.cfg.path)
        last = tl.last_instant()
        if last is None or last <= self.offset:
            return None
        df = self.engine.read_cdc(
            self.cfg, begin=self.offset or None, end=last,
            images=self.images,
        )
        self.offset = last
        return df


def stream_read(
    spark: SparkSession,
    engine,
    table: str,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """File-source change feed over the table data dir (append-only)."""
    cfg = engine._resolve(table)
    schema = engine._stored_schema(cfg)
    if schema is None:
        raise ValueError("table has no commits yet — schema unknown")
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    data = str(Path(cfg.path) / DATA_DIR)
    glob = f"{data}/*" if not cfg.partition_fields else f"{data}/*/*"
    return reader.parquet(glob)
