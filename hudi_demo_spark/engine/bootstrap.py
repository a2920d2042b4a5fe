"""Bootstrap existing parquet directories into engine tables.

Reference parity — BootstrapDemo.scala (hudi0.12_spark3.1, byte-identical
copy in hudi0.12_spark2.4):
- METADATA bootstrap (W9, :207-232): adopt files in place — commit 0 lists
  the source files as `external`; record key / partition path / commit
  time are computed lazily at read (Engine._read_external). No data is
  rewritten — O(#files) metadata, which is the point at 100 TB.
- FULL_RECORD bootstrap (W10, :234-259): read source → stamp meta columns
  → rewrite into table format (one Spark job).
- The 7-case layout matrix of BootstrapDemo.main (:25-36): {metadata,
  full} × {non-partitioned, hive-style dirs, bare-value dirs}, plus
  upsert-after-bootstrap (affected partitions materialize natively).
"""

from __future__ import annotations

from pathlib import Path

from hudi_demo_spark.engine import timeline as tlmod
from hudi_demo_spark.engine.config import COW, TableConfig
from hudi_demo_spark.engine.timeline import Timeline, new_instant

METADATA = "metadata"
FULL_RECORD = "full_record"


def _discover(source_path: Path) -> dict[str, list[Path]]:
    """{partition_rel_dir('' for flat): [parquet files]} — hive-style
    `dt=v` and bare `v` dirs both supported (BootstrapDemo.scala:77-109)."""
    out: dict[str, list[Path]] = {}
    for p in sorted(source_path.rglob("*.parquet")):
        if any(seg.startswith(("_", ".")) for seg in p.relative_to(source_path).parts[:-1]):
            continue
        rel_dir = str(p.parent.relative_to(source_path))
        out.setdefault("" if rel_dir == "." else rel_dir, []).append(p)
    return out


def bootstrap(
    engine,
    source_path: str | Path,
    name: str,
    record_key: str | list[str] | None,
    precombine: str | None = None,
    partition_by: str | list[str] | None = None,
    mode: str = METADATA,
    table_type: str = COW,
    hive_style: bool = True,
    path: str | None = None,
) -> TableConfig:
    source_path = Path(source_path)
    cfg = engine.create_table(
        name,
        record_key=record_key,
        precombine=precombine,
        partition_by=partition_by,
        table_type=table_type,
        hive_style=hive_style,
        path=path,
    )
    parts = _discover(source_path)
    if mode == FULL_RECORD:
        # read source (reconstructing stripped partition columns), then
        # rewrite through the normal overwrite path — BootstrapDemo.scala:234-259
        files = {
            str(f): {
                "path": str(f),
                "kind": "external",
                "partition": _to_pp(pp, cfg),
                "abs_path": str(f),
                "commit": "00000000000000000000",
            }
            for pp, fs in parts.items()
            for f in fs
        }
        df = engine._read_external(cfg, files)
        drop = [c for c in df.columns if c.startswith("_hoodie_")]
        engine.overwrite(df.drop(*drop), cfg)
        return cfg
    instant = new_instant()
    added = []
    for pp, fs in parts.items():
        for f in fs:
            added.append(
                {
                    "path": str(f.relative_to(source_path)),
                    "kind": "external",
                    "partition": _to_pp(pp, cfg),
                    "abs_path": str(f),
                    "commit": instant,
                }
            )
    Timeline(cfg.path).commit(
        instant, tlmod.COMMIT, "bootstrap", added, [], {"mode": mode}
    )
    return cfg


def _to_pp(rel_dir: str, cfg: TableConfig) -> str:
    """Normalize a source dir path to the engine partition path: bare-value
    dirs (`2022-10-08`) become hive-style (`dt=2022-10-08`) when the table
    is hive_style, matching how native writes would lay them out."""
    if not rel_dir or not cfg.partition_fields:
        return rel_dir
    segs = rel_dir.split("/")
    out = []
    for i, seg in enumerate(segs):
        if "=" in seg:
            out.append(seg if cfg.hive_style else seg.split("=", 1)[1])
        else:
            fld = cfg.partition_fields[i] if i < len(cfg.partition_fields) else "p"
            out.append(f"{fld}={seg}" if cfg.hive_style else seg)
    return "/".join(out)
