"""Table configuration — the engine analog of Hudi's table properties.

Reference parity: ``create table ... using hudi options (primaryKey=...,
preCombineField=..., type='cow')`` (hudi0.12_spark3.1/.../SparkSQLDemo.scala:37-52)
and ``HoodieTableMetaClient.withPropertyBuilder()`` init
(java-client/.../HoodieJavaWriteClientExample.java:71-78). Persisted as
``_catalog.json`` inside the table directory (the ``.hoodie`` metafolder
analog — SyncHiveWithDatabase.scala:45 detects tables by that folder).
"""

from __future__ import annotations

import json
from dataclasses import asdict, dataclass, field
from pathlib import Path

# Engine meta columns (Hudi's _hoodie_* meta fields).
COMMIT_TIME_META = "_hoodie_commit_time"
RECORD_KEY_META = "_hoodie_record_key"
PARTITION_PATH_META = "_hoodie_partition_path"
DELETED_META = "_hoodie_is_deleted"  # MOR delete marker (log-file analog)
META_COLS = [COMMIT_TIME_META, RECORD_KEY_META, PARTITION_PATH_META]

CATALOG_FILE = "_catalog.json"
TIMELINE_DIR = "_timeline"
DATA_DIR = "data"

COW = "cow"
MOR = "mor"


def relpath_from_uri(uri: str, data_dir: str | Path) -> str:
    """`input_file_name()` URI → relpath under the table's data dir.
    Spark returns a percent-encoded `file:/...` URI; partition values
    with spaces/non-ASCII must decode before matching live-file
    relpaths. Shared by every index builder that keys on file identity
    (bloom sidecars, functional index) so URI-handling fixes land once."""
    from urllib.parse import unquote

    p = unquote(uri)
    p = p.split("://", 1)[-1] if "://" in p else p
    prefix = str(data_dir).rstrip("/") + "/"
    return p[p.find(prefix) + len(prefix):] if prefix in p else p

# Merge payloads (java-client/.../JavaClientHive2Hudi.java:145-148):
# OVERWRITE_LATEST = OverwriteWithLatestAvroPayload (latest commit wins,
# preCombine breaks intra-batch ties); DEFAULT = DefaultHoodieRecordPayload
# (preCombine/ordering field wins across commits); PARTIAL =
# PartialUpdateAvroPayload (ordering-field winner, but null columns in the
# winning record fall back to the newest non-null value of older versions).
PAYLOAD_OVERWRITE_LATEST = "overwrite_latest"
PAYLOAD_DEFAULT = "default"
PAYLOAD_PARTIAL = "partial_update"


@dataclass
class TableConfig:
    name: str
    path: str
    record_key_fields: list[str] | None = None  # None => random uuid keys (W13)
    precombine_field: str | None = None
    partition_fields: list[str] = field(default_factory=list)
    table_type: str = COW
    payload: str = PAYLOAD_OVERWRITE_LATEST
    hive_style: bool = True  # BootstrapDemo.scala:60-62 HIVE_STYLE_PARTITIONING
    schema_json: str | None = None  # pinned on first write (incl. meta cols)
    # full schema evolution (rename/drop/type-widening — Hudi 0.13
    # schema-on-read): one entry per ALTER, oldest first. Files committed
    # before an entry's `until` instant carry that entry's schema and are
    # projected to the current schema at read time by composing the
    # `rename_to_next` maps along the chain (dropped columns fall away,
    # added columns surface as null, widened columns cast).
    schema_history: list = field(default_factory=list)
    props: dict = field(default_factory=dict)

    def save(self) -> None:
        p = Path(self.path) / CATALOG_FILE
        p.parent.mkdir(parents=True, exist_ok=True)
        tmp = p.with_suffix(".json.tmp")
        tmp.write_text(json.dumps(asdict(self), indent=1))
        tmp.replace(p)

    @staticmethod
    def load(path: str | Path) -> "TableConfig":
        data = json.loads((Path(path) / CATALOG_FILE).read_text())
        return TableConfig(**data)

    @staticmethod
    def exists(path: str | Path) -> bool:
        return (Path(path) / CATALOG_FILE).is_file()
