"""Skew resilience of the write paths: a hive-partition-skewed batch
must not collapse onto one task (the merge shuffle is keyed by record
key, not partition path), and a hot-KEY batch can opt into salted
two-phase preCombine dedup (`write.skew_salt`)."""

import pathlib

from pyspark.sql import functions as F

SCHEMA = "id int, v double, ts long, dt string"


def test_partition_skew_upsert_spreads_tasks(engine, spark):
    """90% of the batch lands in ONE hive partition; the payload window
    shuffles on (partition, record key), so the hot partition's rows
    hash across tasks — proven by the hot partition dir receiving many
    files (one per writing task), not one."""
    engine.create_table("sk", record_key="id", precombine="ts",
                        partition_by="dt")
    rows = [
        (i, float(i), 1, "hot" if i % 10 != 0 else f"cold{i % 5}")
        for i in range(5000)
    ]
    engine.insert(spark.createDataFrame(rows, SCHEMA), "sk")
    # skewed upsert: every hot row again, newer ts
    up = [(i, float(i) + 0.5, 2, "hot") for i in range(5000) if i % 10 != 0]
    engine.upsert(spark.createDataFrame(up, SCHEMA), "sk")
    cfg = engine._resolve("sk")
    hot_files = list(
        (pathlib.Path(cfg.path) / "data" / "dt=hot").glob("*.parquet")
    )
    assert len(hot_files) > 4, (
        f"hot partition written by {len(hot_files)} task(s) — "
        "the merge collapsed onto too few tasks"
    )
    got = engine.read("sk")
    assert got.count() == 5000
    assert got.filter("dt = 'hot'").agg(
        F.min("v")
    ).collect()[0][0] == 1.5  # every hot row took the newer version


def test_salted_dedup_same_winner_and_extra_phase(engine, spark):
    """`write.skew_salt`: one key holds 90% of the batch; the salted
    pre-reduce picks the same winner as the plain window and the plan
    carries the extra Window phase."""
    rows = [(1, float(t), t, "a") for t in range(9000)] + [
        (i, 1.0, 1, "a") for i in range(2, 1002)
    ]
    df = spark.createDataFrame(rows, SCHEMA)

    engine.create_table("skp", record_key="id", precombine="ts",
                        partition_by="dt", table_type="mor",
                        props={"write.skew_salt": "8"})
    engine.create_table("skn", record_key="id", precombine="ts",
                        partition_by="dt", table_type="mor")
    cfg_s = engine._resolve("skp")
    cfg_n = engine._resolve("skn")
    stamped = engine._conform(engine._stamp(df, cfg_s, "t0"), cfg_s)
    plan_s = engine._dedup_batch(stamped, cfg_s)._jdf.queryExecution().toString()
    plan_n = engine._dedup_batch(stamped, cfg_n)._jdf.queryExecution().toString()
    assert plan_s.count("Window") > plan_n.count("Window")

    engine.upsert(df, "skp")
    engine.upsert(df, "skn")
    got_s = {r["id"]: r["ts"] for r in engine.read("skp").collect()}
    got_n = {r["id"]: r["ts"] for r in engine.read("skn").collect()}
    assert got_s == got_n
    assert got_s[1] == 8999 and len(got_s) == 1001
