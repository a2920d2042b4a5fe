"""Bootstrap matrix tests mirroring BootstrapDemo.main
(hudi0.12_spark3.1/.../BootstrapDemo.scala:25-36): {metadata, full} ×
{non-partitioned, hive-style, bare-dir}, plus upsert-after-bootstrap
(SURVEY §5 item 4)."""

import pytest
from pyspark.sql import functions as F

SCHEMA = "id int, name string, value int, ts int, dt string"
SEED = [(1, "a1", 10, 1000, "2022-10-08"), (2, "a2", 20, 2000, "2022-10-09")]
UPSERT = [(2, "a2", 22, 2200, "2022-10-09"), (4, "a4", 40, 4000, "2022-10-08")]


def _src_df(spark):
    return spark.createDataFrame(SEED, SCHEMA)


def _ids(engine, t):
    return sorted(
        (r["id"], r["name"], r["value"]) for r in engine.read(t).collect()
    )


@pytest.mark.parametrize("mode", ["metadata", "full_record"])
def test_bootstrap_nonpartitioned(engine, spark, tmp_path, mode):
    src = tmp_path / "src_flat"
    _src_df(spark).write.mode("overwrite").parquet(str(src))
    engine.bootstrap(src, "bt", record_key="id", precombine="ts", mode=mode)
    assert _ids(engine, "bt") == [(1, "a1", 10), (2, "a2", 20)]


@pytest.mark.parametrize("mode", ["metadata", "full_record"])
def test_bootstrap_hive_style_partitions(engine, spark, tmp_path, mode):
    """partitionBy writes strip dt from files (BootstrapDemo.scala:59);
    the engine reconstructs it from the dir name."""
    src = tmp_path / "src_hive"
    _src_df(spark).write.mode("overwrite").partitionBy("dt").parquet(str(src))
    engine.bootstrap(
        src, "bt", record_key="id", precombine="ts", partition_by="dt", mode=mode
    )
    rows = {r["id"]: r for r in engine.read("bt").collect()}
    assert rows[1]["dt"] == "2022-10-08" and rows[2]["dt"] == "2022-10-09"


@pytest.mark.parametrize("mode", ["metadata", "full_record"])
def test_bootstrap_bare_value_dirs(engine, spark, tmp_path, mode):
    """Manual bare-value partition dirs (BootstrapDemo.scala:101-109)."""
    src = tmp_path / "src_bare"
    df = _src_df(spark)
    for p in ["2022-10-08", "2022-10-09"]:
        (
            df.filter(F.col("dt") == p)
            .write.mode("overwrite")
            .parquet(str(src / p))
        )
    engine.bootstrap(
        src, "bt", record_key="id", precombine="ts", partition_by="dt", mode=mode
    )
    rows = {r["id"]: r for r in engine.read("bt").collect()}
    assert len(rows) == 2 and rows[1]["dt"] == "2022-10-08"


@pytest.mark.parametrize("mode", ["metadata", "full_record"])
def test_upsert_after_bootstrap(engine, spark, tmp_path, mode):
    """BootstrapDemo.scala:264-273: upsert over a bootstrapped table."""
    src = tmp_path / "src_up"
    _src_df(spark).write.mode("overwrite").partitionBy("dt").parquet(str(src))
    engine.bootstrap(
        src, "bt", record_key="id", precombine="ts", partition_by="dt", mode=mode
    )
    engine.upsert(spark.createDataFrame(UPSERT, SCHEMA), "bt")
    assert _ids(engine, "bt") == [
        (1, "a1", 10),
        (2, "a2", 22),
        (4, "a4", 40),
    ]
