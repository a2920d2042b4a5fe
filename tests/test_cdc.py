"""insert_overwrite (partition-scoped replacecommit) and read_cdc
(change-data-capture snapshot diff) semantics."""

from pyspark.sql import functions as F

from hudi_demo_spark.engine.timeline import Timeline

COLS = ["id", "name", "price", "ts", "dt"]
ROWS = [
    (1, "a1", 10.0, 1000, "2022-10-08"),
    (2, "a2", 20.0, 1000, "2022-10-08"),
    (3, "a3", 30.0, 1000, "2022-10-09"),
    (4, "a4", 40.0, 1000, "2022-10-09"),
]


def _mkdf(spark, rows):
    return spark.createDataFrame(
        rows, "id int, name string, price double, ts long, dt string"
    )


def _state(engine, table):
    return sorted(tuple(r) for r in engine.read(table).select(*COLS).collect())


def _setup(engine, spark, table_type="cow"):
    engine.create_table(
        "t", record_key="id", precombine="ts", partition_by="dt",
        table_type=table_type,
    )
    engine.insert(_mkdf(spark, ROWS), "t")
    return "t"


# ---------------------------------------------------------------------------
# insert_overwrite
# ---------------------------------------------------------------------------


def test_insert_overwrite_replaces_only_written_partitions(engine, spark):
    t = _setup(engine, spark)
    before_live = Timeline(engine._resolve(t).path).live_files()
    repl = _mkdf(spark, [(9, "new", 99.0, 2000, "2022-10-09")])
    meta = engine.insert_overwrite(repl, t)
    assert meta["action"] == "replacecommit"
    assert meta["operation"] == "insert_overwrite"
    # 2022-10-08 rows untouched, 2022-10-09 fully replaced by the one row
    assert _state(engine, t) == sorted(
        [ROWS[0], ROWS[1], (9, "new", 99.0, 2000, "2022-10-09")]
    )
    # untouched partition keeps its exact prior files (metadata op)
    after_live = Timeline(engine._resolve(t).path).live_files()
    keep = {p for p, m in before_live.items() if m["partition"].startswith("dt=2022-10-08")}
    assert keep and keep <= set(after_live)
    # replaced files are listed explicitly, not "*"
    assert isinstance(meta["files_removed"], list)
    assert all("2022-10-09" in rp for rp in meta["files_removed"])


def test_insert_overwrite_unpartitioned_is_full_overwrite(engine, spark):
    engine.create_table("u", record_key="id", precombine="ts")
    engine.insert(_mkdf(spark, ROWS), "u")
    engine.insert_overwrite(_mkdf(spark, [ROWS[0]]), "u")
    assert _state(engine, "u") == [ROWS[0]]


def test_incremental_read_dedups_across_insert_overwrite(engine, spark):
    t = _setup(engine, spark)
    # same key rewritten by the overwrite: the (None, latest] range holds
    # two versions of id=3 — the read must return only the newest
    repl = _mkdf(spark, [(3, "a3x", 33.0, 2000, "2022-10-09")])
    engine.insert_overwrite(repl, t)
    inc = engine.read_incremental(t)
    got = sorted(tuple(r) for r in inc.select(*COLS).collect())
    assert (3, "a3x", 33.0, 2000, "2022-10-09") in got
    assert (3, "a3", 30.0, 1000, "2022-10-09") not in got
    assert len([r for r in got if r[0] == 3]) == 1


# ---------------------------------------------------------------------------
# read_cdc
# ---------------------------------------------------------------------------


def _changes(engine, t, begin=None, end=None):
    df = engine.read_cdc(t, begin=begin, end=end)
    return sorted(
        tuple(r) for r in df.select("_change_type", *COLS).collect()
    )


def test_cdc_insert_update_delete(engine, spark):
    t = _setup(engine, spark)
    first = engine.show_commits(t).collect()[-1]["commit_time"]
    engine.upsert(_mkdf(spark, [(2, "a2x", 22.0, 2000, "2022-10-08")]), t)
    engine.delete(t, "id = 3")
    engine.insert(_mkdf(spark, [(5, "a5", 50.0, 2000, "2022-10-09")]), t)
    assert _changes(engine, t, begin=first) == sorted(
        [
            ("update", 2, "a2x", 22.0, 2000, "2022-10-08"),
            ("delete", 3, "a3", 30.0, 1000, "2022-10-09"),
            ("insert", 5, "a5", 50.0, 2000, "2022-10-09"),
        ]
    )


def test_cdc_update_then_delete_reports_delete_only(engine, spark):
    t = _setup(engine, spark)
    first = engine.show_commits(t).collect()[-1]["commit_time"]
    engine.upsert(_mkdf(spark, [(1, "a1x", 11.0, 2000, "2022-10-08")]), t)
    engine.delete(t, "id = 1")
    got = _changes(engine, t, begin=first)
    assert got == [("delete", 1, "a1", 10.0, 1000, "2022-10-08")]


def test_cdc_no_begin_reports_everything_as_insert(engine, spark):
    t = _setup(engine, spark)
    got = _changes(engine, t)
    assert [g[0] for g in got] == ["insert"] * 4


def test_cdc_end_bound_excludes_later_commits(engine, spark):
    t = _setup(engine, spark)
    first = engine.show_commits(t).collect()[-1]["commit_time"]
    engine.upsert(_mkdf(spark, [(2, "a2x", 22.0, 2000, "2022-10-08")]), t)
    mid = engine.show_commits(t).collect()[0]["commit_time"]
    engine.delete(t, "id = 3")
    got = _changes(engine, t, begin=first, end=mid)
    assert got == [("update", 2, "a2x", 22.0, 2000, "2022-10-08")]


def test_cdc_mor_snapshot_diff(engine, spark):
    t = _setup(engine, spark, table_type="mor")
    first = engine.show_commits(t).collect()[-1]["commit_time"]
    engine.upsert(_mkdf(spark, [(4, "a4x", 44.0, 2000, "2022-10-09")]), t)
    engine.delete(t, "id = 1")  # MOR soft-delete marker in a delta
    got = _changes(engine, t, begin=first)
    assert got == sorted(
        [
            ("update", 4, "a4x", 44.0, 2000, "2022-10-09"),
            ("delete", 1, "a1", 10.0, 1000, "2022-10-08"),
        ]
    )


def test_cdc_unchanged_rewrite_not_reported(engine, spark):
    # clustering rewrites files without changing rows: zero changes
    t = _setup(engine, spark)
    first = engine.show_commits(t).collect()[-1]["commit_time"]
    engine.cluster(t, sort_cols=["id"])
    assert _changes(engine, t, begin=first) == []


def test_cdc_requires_record_key(engine, spark):
    engine.create_table("k", record_key=None)
    engine.insert(_mkdf(spark, ROWS), "k")
    try:
        engine.read_cdc("k")
        raised = False
    except ValueError:
        raised = True
    assert raised


def test_cdc_before_and_after_images(engine, spark):
    """images='both' (Hudi cdc-file shape): update rows carry BOTH
    images, inserts a null before, deletes a null after."""
    from pyspark.sql import functions as F

    engine.create_table("cdcimg", record_key="k", precombine="ts")
    df = spark.createDataFrame(
        [(1, 10.0, 1), (2, 20.0, 1)], "k int, v double, ts long"
    )
    engine.insert(df, "cdcimg")
    base = engine.show_commits("cdcimg").collect()[0]["commit_time"]
    engine.upsert(
        spark.createDataFrame([(1, 11.0, 2), (3, 30.0, 2)],
                              "k int, v double, ts long"),
        "cdcimg",
    )
    engine.delete("cdcimg", "k = 2")
    rows = {
        r["_change_type"]: r
        for r in engine.read_cdc("cdcimg", begin=base, images="both").collect()
    }
    assert set(rows) == {"insert", "update", "delete"}
    upd = rows["update"]
    assert upd["before"]["v"] == 10.0 and upd["after"]["v"] == 11.0
    assert rows["insert"]["before"] is None
    assert rows["insert"]["after"]["v"] == 30.0
    assert rows["delete"]["after"] is None
    assert rows["delete"]["before"]["v"] == 20.0
