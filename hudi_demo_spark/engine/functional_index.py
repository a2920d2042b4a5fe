"""Functional index — the Hudi 1.0 ``CREATE INDEX ... USING
functional_index(expr)`` analog: per-file [min, max] of an EXPRESSION,
for file skipping on predicates over derived values.

Reference parity: the reference's only index tuning is read-cost
control for upserts (java-client/.../JavaClientHive2Hudi.java:167-180);
Hudi 1.0 extends the same metadata machinery to expression indexes —
this module is that surface over the engine's commit-sidecar layout.

Why it exists: commit-time col_stats (``write.stats_cols``) and
clustering stats cover physical columns; predicates over an expression
— ``hour(ts)``, ``substr(url, 1, 20)``, ``price * (1 - discount)`` —
can't use parquet footers at all. The functional index evaluates the
expression once per file (distributed, column-pruned scan) and records
the range, so a ``WHERE f(x) BETWEEN lo AND hi`` read skips every file
whose range cannot overlap. At 100 TB that turns a derived-value scan
into a scan of the files that can match.

Design:
- Layout: ``<table>/_index/functional/<name>/<instant>.json`` — one
  JSON per build/commit mapping relpath → [min, max]; readers merge all
  (last write wins per file). Per-instant files make concurrent writers
  conflict-free, same shape as the timeline.
- BASE FILES ONLY, deliberately: delta files carry no entries and are
  therefore never skipped, so under MOR merge a skipped base file
  cannot hide a newer merge winner (the same invariant commit-metadata
  col_stats pruning relies on).
- Files without an entry are always kept — pruning is an optimization,
  never a filter; the row-level predicate is applied after the (merged)
  read regardless.
- Maintenance: every base-file write evaluates the expression over the
  just-written files (one column-pruned pass over the new files, cost
  O(batch) regardless of table size). Rolled-back / cleaned files leave
  stale entries that are never consulted (pruning intersects with the
  live-file set).
- Only JSON-safe scalar ranges (int/float/str/bool) are recorded;
  anything else leaves the file un-prunable (conservative).
"""

from __future__ import annotations

import json
import shutil
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hudi_demo_spark.engine.config import TableConfig, relpath_from_uri

PROP_PREFIX = "index.functional."
MARKER = "_complete"


def indexed_exprs(cfg: TableConfig) -> dict[str, str]:
    """{index_name: expression} declared on the table."""
    out = {}
    for k, v in cfg.props.items():
        if k.startswith(PROP_PREFIX) and not k.endswith(".buckets"):
            out[k[len(PROP_PREFIX):]] = str(v)
    return out


def _json_safe(v):
    if isinstance(v, (int, float, str, bool)) and not isinstance(v, bytes):
        return v
    return None


class FunctionalIndex:
    def __init__(self, spark: SparkSession, cfg: TableConfig, name: str,
                 expr: str):
        self.spark = spark
        self.cfg = cfg
        self.name = name
        self.expr = expr
        self.dir = Path(cfg.path) / "_index" / "functional" / name

    # ---------------- state ----------------

    def usable(self) -> bool:
        return (self.dir / MARKER).is_file()

    def truncate(self) -> None:
        shutil.rmtree(self.dir, ignore_errors=True)

    def _mark_complete(self) -> None:
        self.dir.mkdir(parents=True, exist_ok=True)
        (self.dir / MARKER).touch()

    # ---------------- write side ----------------

    def _eval_ranges(self, relpaths: list[str]) -> dict[str, list]:
        """One distributed pass: {relpath: [min, max]} of the expression
        over each file. Column-pruned by Catalyst (only the expression's
        input columns are read)."""
        if not relpaths:
            return {}
        data = Path(self.cfg.path) / "data"
        df: DataFrame = self.spark.read.parquet(
            *[str(data / p) for p in relpaths]
        )
        agg = (
            df.select(
                F.input_file_name().alias("__f"),
                F.expr(self.expr).alias("__v"),
            )
            .groupBy("__f")
            .agg(F.min("__v").alias("lo"), F.max("__v").alias("hi"))
            .collect()
        )
        out: dict[str, list] = {}
        for r in agg:
            p = relpath_from_uri(r["__f"], data)
            lo, hi = _json_safe(r["lo"]), _json_safe(r["hi"])
            if lo is not None and hi is not None:
                out[p] = [lo, hi]
        return out

    def _write(self, tag: str, ranges: dict[str, list]) -> None:
        if not ranges:
            return
        self.dir.mkdir(parents=True, exist_ok=True)
        p = self.dir / f"{tag}.json"
        tmp = p.with_suffix(".tmp")
        tmp.write_text(json.dumps(ranges))
        tmp.replace(p)

    def build(self, live_base_relpaths: list[str], instant: str) -> None:
        self.truncate()
        self._write(instant, self._eval_ranges(live_base_relpaths))
        self._mark_complete()

    def append(self, base_relpaths: list[str], instant: str) -> None:
        self._write(instant, self._eval_ranges(base_relpaths))

    # a compacted fold must sort BEFORE every real instant file —
    # ranges() merges in filename order with newest-wins per path
    _COMPACTED_TAG = "00000000000000000000_compacted"

    def compact(self, live: set[str] | None = None) -> None:
        """Fold all entry files into one, dropping entries for paths not
        in `live` — bounds sidecar metadata at O(live base files)
        regardless of commit count. Driver-side JSON work only."""
        if not self.usable():
            return
        rng = self.ranges()
        if live is not None:
            rng = {p: v for p, v in rng.items() if p in live}
        for p in self.dir.glob("*.json"):
            p.unlink()
        self._write(self._COMPACTED_TAG, rng)
        self._mark_complete()

    # ---------------- read side ----------------

    def ranges(self) -> dict[str, list]:
        """Merged {relpath: [min, max]} across all entry files (newest
        instant wins per path)."""
        out: dict[str, list] = {}
        if not self.dir.is_dir():
            return out
        for p in sorted(self.dir.glob("*.json")):
            try:
                out.update(json.loads(p.read_text()))
            except (OSError, ValueError):
                continue
        return out

    def prune(self, files: dict[str, dict], lo, hi) -> dict[str, dict]:
        """Drop files whose recorded range cannot intersect [lo, hi];
        files without an entry (deltas, pre-index files) are kept."""
        rng = self.ranges()
        out: dict[str, dict] = {}
        for p, m in files.items():
            r = rng.get(p)
            if r is not None:
                try:
                    if (hi is not None and r[0] > hi) or (
                        lo is not None and r[1] < lo
                    ):
                        continue
                except TypeError:
                    pass
            out[p] = m
        return out
