"""Real Hive-metastore sync (D5) — SyncHiveWithDatabase.scala:37-76 and
SyncCommentsAcrossClusters.scala:79-113: `sync_catalog(database=...)` on
a hive-enabled session pushes external-table definitions (schema,
column comments, partitions, hudi.* props) into an embedded
Derby-backed metastore that PERSISTS across processes.

Run in subprocesses because `enableHiveSupport` is a static conf that
must be chosen before the JVM starts — the shared test session is
non-hive."""

import pytest
import os
import subprocess
import sys
import textwrap
from pathlib import Path

REPO = str(Path(__file__).resolve().parent.parent)


def _run(code: str, cwd: str) -> str:
    r = subprocess.run(
        [sys.executable, "-c", textwrap.dedent(code)],
        capture_output=True, text=True, cwd=cwd,
        env={**os.environ, "PYTHONPATH": REPO}, timeout=300,
    )
    assert r.returncode == 0, r.stdout + "\n" + r.stderr
    return r.stdout


@pytest.mark.slow
def test_sync_survives_new_process(tmp_path):
    ms = str(tmp_path / "metastore")
    lake = str(tmp_path / "lake")
    # phase 1: build a table (2 commits + clean → data/ is exactly the
    # snapshot), comment a column, sync into the metastore
    out1 = _run(f"""
        import sys; sys.path.insert(0, {REPO!r})
        from hudi_demo_spark import Engine, get_spark
        spark = get_spark("hms1", cpus=4, hive=True, metastore_dir={ms!r})
        eng = Engine(spark, {lake!r})
        eng.create_table("trips", record_key="id", precombine="ts",
                         partition_by="dt")
        sch = "id int, fare double, ts long, dt string"
        eng.insert(spark.createDataFrame(
            [(1, 10.0, 1, "2022-01-01"), (2, 20.0, 1, "2022-01-02")], sch),
            "trips")
        eng.upsert(spark.createDataFrame(
            [(1, 11.0, 2, "2022-01-01")], sch), "trips")
        eng.clean("trips", retain_commits=1, stale_staging_s=0)
        eng.alter_column_comment("trips", "fare", "total fare in USD")
        print("synced:", eng.sync_catalog(database="hudb"))
        # direct metastore ALTER (SyncCommentsAcrossClusters.scala:100-103)
        eng.alter_column_comment("trips", "ts", "event micros",
                                 database="hudb")
    """, cwd=str(tmp_path))
    assert "synced: ['trips']" in out1
    # phase 2: a brand-new JVM + SparkSession sees the table, comment,
    # partitions, and the exact snapshot rows via plain catalog SQL
    out2 = _run(f"""
        import sys; sys.path.insert(0, {REPO!r})
        from hudi_demo_spark import get_spark
        spark = get_spark("hms2", cpus=4, hive=True, metastore_dir={ms!r})
        print("tables:", [t.name for t in spark.catalog.listTables("hudb")])
        desc = {{r["col_name"]: r["comment"]
                for r in spark.sql("DESCRIBE TABLE hudb.trips").collect()}}
        print("fare_comment:", desc.get("fare"))
        print("ts_comment:", desc.get("ts"))
        parts = sorted(r[0] for r in
                       spark.sql("SHOW PARTITIONS hudb.trips").collect())
        print("partitions:", parts)
        rows = sorted((r["id"], r["fare"]) for r in
                      spark.sql("SELECT id, fare FROM hudb.trips").collect())
        print("rows:", rows)
        props = {{r["key"]: r["value"] for r in spark.sql(
            "SHOW TBLPROPERTIES hudb.trips").collect()}}
        print("ttype:", props.get("hudi.table.type"),
              props.get("hudi.record.key"))
    """, cwd=str(tmp_path))
    assert "tables: ['trips']" in out2
    assert "fare_comment: total fare in USD" in out2
    assert "ts_comment: event micros" in out2
    assert "partitions: ['dt=2022-01-01', 'dt=2022-01-02']" in out2
    assert "rows: [(1, 11.0), (2, 20.0)]" in out2
    assert "ttype: cow id" in out2


def test_sync_database_requires_hive_session(engine):
    import pytest

    with pytest.raises(ValueError, match="hive-enabled"):
        engine.sync_catalog(database="hudb")
