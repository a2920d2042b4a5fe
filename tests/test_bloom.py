"""Bloom-filter key index (M1 — JavaClientHive2Hudi.java:167-180):
unit tests for the filter itself, and engine tests proving (a) point
upserts skip files the filter rules out even when key RANGES overlap
everywhere (the case range pruning cannot help), and (b) results stay
identical to the no-bloom table."""

import pytest
from pyspark.sql import functions as F

from hudi_demo_spark.engine import bloom as B


# ---------------------------------------------------------------- unit

def test_bloom_no_false_negatives():
    keys = [f"k{i:05d}" for i in range(5000)]
    import tempfile
    from pathlib import Path

    import numpy as np

    with tempfile.NamedTemporaryFile(delete=False) as f:
        f.write(B.build(keys, 1e-6, 150_000))
    bl = B.load(Path(f.name))
    for probe in ["k00000", "k02500", "k04999"]:
        h1, h2 = B.key_hashes(probe)
        assert B.might_contain_any(
            bl,
            np.array([h1], dtype=np.uint64),
            np.array([h2], dtype=np.uint64),
        )


def test_bloom_rejects_absent_keys():
    keys = [f"k{i:05d}" for i in range(5000)]
    import tempfile
    from pathlib import Path

    with tempfile.NamedTemporaryFile(delete=False) as f:
        f.write(B.build(keys, 1e-6, 150_000))
    bl = B.load(Path(f.name))
    import numpy as np

    absent = np.array(
        [B.key_hashes(f"absent-{i}") for i in range(200)], dtype=np.uint64
    )
    # at fpp=1e-6 the chance ANY of 200 absent keys false-positives is
    # ~2e-4 — deterministic inputs, so this is a fixed outcome, not flaky
    assert not B.might_contain_any(bl, absent[:, 0], absent[:, 1])


def test_bloom_overload_degrades_not_wrong():
    # more keys than the dynamic cap: filter overloads (higher FPP) but
    # still never false-negative
    keys = [f"x{i}" for i in range(3000)]
    import tempfile
    from pathlib import Path

    with tempfile.NamedTemporaryFile(delete=False) as f:
        f.write(B.build(keys, 0.01, 500))
    bl = B.load(Path(f.name))
    import numpy as np

    h = np.array([B.key_hashes(k) for k in keys[::97]], dtype=np.uint64)
    for row in h:
        assert B.might_contain_any(bl, row[0:1], row[1:2])


# -------------------------------------------------------------- engine

def _seed(engine, spark, props):
    """One partition, several base files with fully OVERLAPPING key
    ranges: ids interleaved across files so [key_min, key_max] of every
    file spans the space and range pruning keeps all of them."""
    engine.create_table(
        "t", record_key="id", precombine="ts", partition_by="dt",
        props=props,
    )
    for batch in range(4):
        rows = [
            (i, f"n{i}", float(i), 100, "2022-09-05")
            for i in range(batch, 4000, 4)
        ]
        engine.insert(
            spark.createDataFrame(
                rows, "id int, name string, price double, ts long, dt string"
            ),
            "t",
        )
    return "t"


def _live_by_path(engine, t):
    from hudi_demo_spark.engine.timeline import Timeline

    return Timeline(engine._resolve(t).path).live_files()


def test_bloom_sidecars_written(engine, spark):
    t = _seed(engine, spark, {"index.bloom.enabled": "true"})
    live = _live_by_path(engine, t)
    assert live and all(m.get("bloom") for m in live.values())
    for p in live:
        assert B.sidecar_path(engine._resolve(t).path, p).is_file()


def test_bloom_point_upsert_skips_files(engine, spark):
    t = _seed(engine, spark, {"index.bloom.enabled": "true"})
    before = set(_live_by_path(engine, t))
    assert len(before) >= 3
    # one existing key: ranges overlap every file, bloom pins the one
    up = spark.createDataFrame(
        [(17, "upd", 99.0, 200, "2022-09-05")],
        "id int, name string, price double, ts long, dt string",
    )
    meta = engine.upsert(up, t)
    assert len(meta["files_removed"]) == 1
    row = engine.read(t).filter("id = 17").collect()
    assert len(row) == 1 and row[0]["price"] == 99.0
    assert engine.read(t).count() == 4000


def test_bloom_matches_no_bloom_results(engine, spark):
    ta = _seed(engine, spark, {"index.bloom.enabled": "true"})
    up = spark.createDataFrame(
        [(17, "upd", 99.0, 200, "2022-09-05"),
         (9999, "new", 1.0, 200, "2022-09-05")],
        "id int, name string, price double, ts long, dt string",
    )
    engine.upsert(up, ta)
    engine.delete_keys(
        ta, spark.createDataFrame([(33, "2022-09-05")], "id int, dt string")
    )
    got = sorted(
        tuple(r) for r in engine.read(ta).select("id", "price").collect()
    )
    expect = sorted(
        [(i, float(i)) for i in range(4000) if i not in (17, 33)]
        + [(17, 99.0), (9999, 1.0)]
    )
    assert got == expect


def test_bloom_delete_keys_prunes(engine, spark):
    t = _seed(engine, spark, {"index.bloom.enabled": "true"})
    meta = engine.delete_keys(
        t, spark.createDataFrame([(20, "2022-09-05")], "id int, dt string")
    )
    assert len(meta["files_removed"]) == 1
    assert engine.read(t).filter("id = 20").count() == 0
    assert engine.read(t).count() == 3999


def test_show_bloom_filters_procedure(engine, spark):
    t = _seed(engine, spark, {"index.bloom.enabled": "true"})
    live = _live_by_path(engine, t)
    rows = engine.sql(f"call show_bloom_filters(table => '{t}')").collect()
    assert {r["file"] for r in rows} == set(live)
    assert all(r["m_bits"] > 0 and r["k_hashes"] >= 1 for r in rows)
    assert sum(r["n_keys"] for r in rows) == 4000


def test_bloom_clean_sweeps_sidecars(engine, spark):
    t = _seed(engine, spark, {"index.bloom.enabled": "true"})
    cfg = engine._resolve(t)
    up = spark.createDataFrame(
        [(17, "upd", 99.0, 200, "2022-09-05")],
        "id int, name string, price double, ts long, dt string",
    )
    engine.upsert(up, t)
    engine.clean(t, retain_commits=1, stale_staging_s=0.0)
    live = set(_live_by_path(engine, t))
    from pathlib import Path

    bloom_root = Path(cfg.path) / B.BLOOM_DIR
    on_disk = {
        str(p.relative_to(bloom_root))[: -len(".bf")]
        for p in bloom_root.rglob("*.bf")
    }
    assert on_disk == live


@pytest.mark.slow
def test_bulk_commit_writes_sidecars_executor_side(engine, spark):
    """Scale contract: a bulk commit landing many base files must not
    funnel bloom bitmaps through the driver — _build_blooms writes each
    sidecar inside its executor task and the driver only collects tiny
    (file, ok) acks. Proven by committing 64+ base files across 64
    partitions and inspecting the returned ack rows."""
    engine.create_table(
        "tb64", record_key="id", precombine="ts", partition_by="dt",
        props={"index.bloom.enabled": "true"},
    )
    rows = [
        (i, float(i), 1, f"p{i % 64:02d}") for i in range(6400)
    ]
    df = spark.createDataFrame(rows, "id int, price double, ts long, dt string")
    engine.insert(df, "tb64")
    live = _live_by_path(engine, "tb64")
    base = {p: m for p, m in live.items() if m.get("kind") == "base"}
    assert len(base) >= 64
    cfg = engine._resolve("tb64")
    for p, m in base.items():
        assert m.get("bloom") is True
        side = B.sidecar_path(cfg.path, p)
        assert side.is_file() and side.stat().st_size > 0
        # no leftover tmp from the atomic publish
        assert not (side.parent / (side.name + ".tmp")).exists()
    # the driver-side ack rows carry NO bitmap payload
    acks = engine._build_blooms(cfg, [dict(m, path=p) for p, m in base.items()])
    assert acks and all(set(r.asDict()) == {"f", "ok"} and r["ok"] for r in acks)
    # probes still prune: a single-key upsert touches one file group
    upd = spark.createDataFrame(
        [(7, 700.0, 9, "p07")], "id int, price double, ts long, dt string"
    )
    n_before = len(_live_by_path(engine, "tb64"))
    engine.upsert(upd, "tb64")
    got = engine.read("tb64").filter("id = 7").collect()
    assert got[0]["price"] == 700.0
    assert len(_live_by_path(engine, "tb64")) == n_before
