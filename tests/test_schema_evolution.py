"""Full schema evolution (Hudi 0.13 schema-on-read ALTER TABLE):
rename / drop / type-widen / add without rewriting data files; old
epochs project to the current schema at read time. The additive path
(auto-evolution on write) is covered in test_dml; this file covers the
ALTER surface."""

import pytest
from pyspark.sql import functions as F


def _mk(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


def _setup(engine, spark, table_type="cow"):
    engine.create_table(
        "ev", record_key="id", precombine="ts", partition_by="dt",
        table_type=table_type,
    )
    engine.insert(
        _mk(
            spark,
            [(1, 10, "a", "x1", 1, "p0"), (2, 20, "b", "x2", 1, "p0")],
            "id int, v int, label0 string, junk string, ts long, dt string",
        ),
        "ev",
    )
    return "ev"


def test_alter_rename_widen_drop_add_roundtrip(engine, spark):
    t = _setup(engine, spark)
    engine.alter_table(
        t,
        rename={"label0": "label"},
        widen={"v": "bigint"},
        drop=["junk"],
        add={"w": "double"},
    )
    # new-schema write lands in the new epoch
    engine.insert(
        _mk(
            spark,
            [(3, 30, "c", 2.5, 2, "p1")],
            "id int, v bigint, label string, w double, ts long, dt string",
        ),
        t,
    )
    got = {
        r["id"]: (r["v"], r["label"], r["w"])
        for r in engine.read(t).collect()
    }
    assert got == {
        1: (10, "a", None),  # renamed + widened + added-null
        2: (20, "b", None),
        3: (30, "c", 2.5),
    }
    cols = engine.read(t).columns
    assert "junk" not in cols and "label0" not in cols
    # v is bigint everywhere now
    assert dict(engine.read(t).dtypes)["v"] == "bigint"


def test_alter_then_upsert_across_epochs(engine, spark):
    t = _setup(engine, spark)
    engine.alter_table(t, rename={"label0": "label"}, drop=["junk"])
    engine.upsert(
        _mk(
            spark,
            [(1, 11, "a2", 2, "p0")],
            "id int, v int, label string, ts long, dt string",
        ),
        t,
    )
    got = {r["id"]: (r["v"], r["label"]) for r in engine.read(t).collect()}
    assert got == {1: (11, "a2"), 2: (20, "b")}


def test_alter_chained_renames_compose(engine, spark):
    t = _setup(engine, spark)
    engine.alter_table(t, rename={"label0": "mid"})
    engine.alter_table(t, rename={"mid": "final"})
    got = {r["id"]: r["final"] for r in engine.read(t).collect()}
    assert got == {1: "a", 2: "b"}


def test_alter_guards(engine, spark):
    t = _setup(engine, spark)
    with pytest.raises(ValueError, match="immutable"):
        engine.alter_table(t, rename={"id": "pk"})
    with pytest.raises(ValueError, match="immutable"):
        engine.alter_table(t, drop=["dt"])
    with pytest.raises(ValueError, match="immutable"):
        engine.alter_table(t, widen={"ts": "string"})
    with pytest.raises(ValueError, match="unsafe"):
        engine.alter_table(t, widen={"v": "smallint"})
    with pytest.raises(ValueError, match="no such column"):
        engine.alter_table(t, drop=["ghost"])
    with pytest.raises(ValueError, match="collides"):
        engine.alter_table(t, rename={"label0": "junk"})
    with pytest.raises(ValueError, match="separate alters"):
        engine.alter_table(t, rename={"v": "u"}, widen={"v": "bigint"})
    # atomic -> string is always allowed
    engine.alter_table(t, widen={"v": "string"})
    assert dict(engine.read(t).dtypes)["v"] == "string"
    assert {r["v"] for r in engine.read(t).collect()} == {"10", "20"}


def test_alter_mor_merge_and_compaction_across_epochs(engine, spark):
    t = _setup(engine, spark, table_type="mor")
    engine.alter_table(t, rename={"label0": "label"}, add={"w": "double"})
    engine.upsert(
        _mk(
            spark,
            [(2, 21, "b2", 9.9, 2, "p0")],
            "id int, v int, label string, w double, ts long, dt string",
        ),
        t,
    )
    got = {
        r["id"]: (r["v"], r["label"], r["w"])
        for r in engine.read(t).collect()
    }
    assert got == {1: (10, "a", None), 2: (21, "b2", 9.9)}
    engine.compact(t)
    got2 = {
        r["id"]: (r["v"], r["label"], r["w"])
        for r in engine.read(t).collect()
    }
    assert got2 == got


def test_alter_sql_surface(engine, spark):
    t = _setup(engine, spark)
    engine.sql(f"alter table {t} rename column label0 to label")
    engine.sql(f"alter table {t} alter column v type bigint")
    engine.sql(f"alter table {t} add columns (w double, note string)")
    engine.sql(f"alter table {t} drop column junk")
    cols = dict(engine.read(t).dtypes)
    assert cols["v"] == "bigint" and "note" in cols and "junk" not in cols
    engine.sql(f"alter table {t} change id id int comment 'the key'")
    assert engine._resolve(t).props["column_comments"]["id"] == "the key"


def test_alter_time_travel_projects_to_current_schema(engine, spark):
    t = _setup(engine, spark)
    pre = engine.show_commits(t).collect()[0]["commit_time"]
    engine.alter_table(t, rename={"label0": "label"}, drop=["junk"])
    engine.insert(
        _mk(
            spark,
            [(9, 90, "z", 9, "p9")],
            "id int, v int, label string, ts long, dt string",
        ),
        t,
    )
    old = engine.read(t, as_of=pre)
    assert sorted(r["id"] for r in old.collect()) == [1, 2]
    assert "label" in old.columns and "junk" not in old.columns


def test_datasource_reads_evolved_table(engine, spark):
    """spark.read.format("hudi") over a schema-evolved table: old-epoch
    files come back with renamed columns carried, widened types cast and
    added columns null — identical to Engine.read."""
    from hudi_demo_spark.sources.datasource import register

    register(spark)
    t = _setup(engine, spark)
    engine.alter_table(
        t, rename={"label0": "label"}, widen={"v": "bigint"},
        drop=["junk"], add={"w": "double"},
    )
    engine.insert(
        _mk(
            spark,
            [(3, 30, "c", 2.5, 2, "p1")],
            "id int, v bigint, label string, w double, ts long, dt string",
        ),
        t,
    )
    cfg = engine._resolve(t)
    via_ds = {
        r["id"]: (r["v"], r["label"], r["w"])
        for r in spark.read.format("hudi").load(str(cfg.path)).collect()
    }
    via_engine = {
        r["id"]: (r["v"], r["label"], r["w"])
        for r in engine.read(t).collect()
    }
    assert via_ds == via_engine == {
        1: (10, "a", None), 2: (20, "b", None), 3: (30, "c", 2.5)
    }


def test_alter_refuses_external_bootstrap_files(engine, spark, tmp_path):
    src = tmp_path / "src"
    _mk(spark, [(1, "a", 5)], "id int, name string, v int").write.parquet(
        str(src)
    )
    engine.bootstrap(str(src), "bt", record_key="id", mode="metadata")
    with pytest.raises(ValueError, match="external"):
        engine.alter_table("bt", rename={"name": "label"})
