"""insert_overwrite (partition-scoped replacecommit) and read_cdc
(change-data-capture snapshot diff) semantics."""

import pytest
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


@pytest.mark.slow
def test_changed_keys_differential_vs_read_cdc_randomized(engine, spark):
    """`Engine.changed_keys` (round 8: the column-pruned (key,
    commit_time) diff every derived-table refresh consumes) must relate
    to `read_cdc` as documented over ARBITRARY DML sequences:

      cdc_keys ⊆ changed_keys ⊆ cdc_keys ∪ {bit-identical rewrites}

    Randomized differential: 40 seeded windows over mixed
    insert/upsert/update/delete sequences on COW and MOR tables; for
    each window both key sets are computed and the containment (plus
    exact equality when the window has no same-value rewrite) is
    asserted. An extra key is tolerated ONLY if the sequence re-wrote
    that key with its existing value (idempotent for refreshes)."""
    import random

    from hudi_demo_spark.engine.timeline import Timeline

    rnd = random.Random(1234)
    for table_type in ("cow", "mor"):
        t = f"ck_{table_type}"
        engine.create_table(
            t, record_key="id", precombine="ts", partition_by="dt",
            table_type=table_type,
        )
        state: dict[int, tuple] = {}
        seq = 0

        def mk(rows):
            return spark.createDataFrame(
                rows, "id int, name string, price double, ts long, dt string"
            )

        def apply_random_op():
            nonlocal seq
            seq += 1
            op = rnd.choice(["insert", "upsert", "update", "delete"])
            ids = rnd.sample(range(1, 13), rnd.randint(1, 4))
            if op in ("insert", "upsert"):
                rows = [
                    (i, f"n{seq}", float(rnd.randint(1, 5)), seq,
                     f"d{i % 3}")
                    for i in ids
                ]
                # keep inserts collision-free (insert has no dedup
                # contract for existing keys under this schema)
                if op == "insert":
                    rows = [r for r in rows if r[0] not in state]
                    if not rows:
                        return
                    engine.insert(mk(rows), t)
                else:
                    engine.upsert(mk(rows), t)
                for r in rows:
                    state[r[0]] = r
            elif op == "update":
                lo = rnd.randint(1, 12)
                engine.update(
                    t, set={"price": F.col("price") + 1},
                    where=f"id >= {lo}",
                )
                for k, r in list(state.items()):
                    if k >= lo:
                        state[k] = (r[0], r[1], r[2] + 1, r[3], r[4])
            else:
                lo = rnd.randint(1, 12)
                engine.delete(t, f"id >= {lo} and id <= {lo + 2}")
                for k in list(state):
                    if lo <= k <= lo + 2:
                        del state[k]

        # bootstrap a few rows so windows have a before-state
        engine.insert(
            mk([(i, "a", 1.0, 0, f"d{i % 3}") for i in (1, 2, 3, 4)]), t
        )
        for i in (1, 2, 3, 4):
            state[i] = (i, "a", 1.0, 0, f"d{i % 3}")

        for window in range(20):
            begin = Timeline(engine._resolve(t).path).last_instant()
            before = dict(state)
            for _ in range(rnd.randint(1, 3)):
                apply_random_op()
            cdc = {
                r[0]
                for r in engine.read_cdc(t, begin=begin)
                .select("_hoodie_record_key").collect()
            }
            ck = {
                r[0]
                for r in engine.changed_keys(t, begin=begin).collect()
            }
            assert cdc <= ck, (table_type, window, cdc - ck)
            # the typed-column mode (round 9) must name the SAME key
            # set, decomposed — here the key is a single int column
            ckc = {
                r["id"]
                for r in engine.changed_keys(
                    t, begin=begin, key_columns=True
                ).collect()
            }
            assert ckc == {int(k) for k in ck}, (table_type, window)
            extras = ck - cdc
            for key in extras:
                # tolerated only for bit-identical rewrites: the key
                # exists, unchanged, on both sides of the window
                k = int(key)
                assert k in before and k in state and \
                    before[k] == state[k], (table_type, window, key)


def test_changed_keys_key_columns_composite(engine, spark):
    """key_columns=True decomposes a COMPOSITE record key into its
    typed columns straight off the (key columns, commit_time) diff
    scan — no parsing of the composed `_hoodie_record_key` string.
    Deterministic DML window with no bit-identical rewrite, so the set
    must match read_cdc's exactly."""
    engine.create_table(
        "ckc", record_key=["id", "g"], precombine="ts",
    )
    mk = lambda rows: spark.createDataFrame(
        rows, "id int, g string, v double, ts long"
    )
    engine.insert(
        mk([(i, g, 1.0, 0) for i in (1, 2) for g in ("a", "b")]), "ckc"
    )
    begin = Timeline(engine._resolve("ckc").path).last_instant()
    engine.upsert(mk([(1, "a", 9.0, 1), (3, "c", 3.0, 1)]), "ckc")
    engine.delete("ckc", "id = 2 and g = 'b'")
    got = sorted(
        (r["id"], r["g"])
        for r in engine.changed_keys(
            "ckc", begin=begin, key_columns=True
        ).collect()
    )
    assert got == [(1, "a"), (2, "b"), (3, "c")]
    # typed columns, not strings
    sch = engine.changed_keys("ckc", begin=begin, key_columns=True).schema
    assert [f.dataType.simpleString() for f in sch.fields] == [
        "int", "string",
    ]


def test_join_view_composite_key_refresh_never_reads_cdc(
    engine, spark, monkeypatch
):
    """A join view over a COMPOSITE-keyed source must refresh its
    mutated windows through the column-pruned changed_keys scan — the
    round-8 fallback paid full CDC row-image IO per refresh for
    multi-column keys. read_cdc is monkeypatched to raise, so ANY
    row-image read for key discovery fails the test; the refreshed
    view must still equal the from-scratch join."""
    from hudi_demo_spark.engine.derived import (
        create_join_view, refresh_join_view,
    )

    engine.create_table("cjl", record_key=["id", "g"], precombine="ts")
    mk = lambda rows: spark.createDataFrame(
        rows, "id int, g string, v double, ts long"
    )
    engine.insert(
        mk([(i, g, 1.0, 0) for i in (1, 2, 3) for g in ("a", "b")]),
        "cjl",
    )
    engine.create_table("cjr", record_key="g")
    engine.insert(
        spark.createDataFrame(
            [("a", "x"), ("b", "y")], "g string, w string"
        ),
        "cjr",
    )
    create_join_view(engine, "cjv", "cjl", "cjr", on=["g"])
    assert refresh_join_view(engine, "cjv") is not None

    # mutated window on BOTH sides: update + delete
    engine.update("cjl", set={"v": F.col("v") + 1}, where="id >= 2")
    engine.delete("cjl", "id = 1 and g = 'a'")
    engine.update("cjr", set={"w": F.lit("z")}, where="g = 'b'")

    def _boom(*a, **k):
        raise AssertionError(
            "refresh used read_cdc row images for key discovery"
        )

    monkeypatch.setattr(engine, "read_cdc", _boom)
    assert refresh_join_view(engine, "cjv") is not None
    monkeypatch.undo()

    got = sorted(
        tuple(r)
        for r in engine.read("cjv")
        .select("id", "g", "v", "w").collect()
    )
    want = sorted(
        tuple(r)
        for r in engine.read("cjl").select("id", "g", "v")
        .join(engine.read("cjr").select("g", "w"), "g")
        .select("id", "g", "v", "w").collect()
    )
    assert got == want and len(got) == 5
