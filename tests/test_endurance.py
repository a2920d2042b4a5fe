"""Endurance: a 30-commit mixed workload (upserts, predicate deletes,
partition overwrite, MERGE mirror) interleaved with EVERY table service
(compaction, log compaction, clustering, clean under all policies,
archive, savepoint, index maintenance) on a MOR table — final snapshot
compared EXACTLY against a DuckDB table receiving the equivalent SQL
mutations, and validate_table must pass every check. This is the
"services never change content" guarantee under sustained use, at a
size (sf0.001 orders, ~80 partitions) where every code path actually
fires."""

import duckdb
import pytest
from pyspark.sql import functions as F

# endurance / randomized-property sweeps: excluded from the default run
# (driver verify window); enable with --runslow or SPARK_GRAFT_SLOW=1
pytestmark = pytest.mark.slow

from hudi_demo_spark.sources.readers import load_table


@pytest.mark.parametrize("table_type", ["mor", "cow"])
def test_sustained_mixed_workload_matches_duckdb(
    engine, spark, sf_dir, table_type
):
    o = (
        load_table(spark, sf_dir, "orders")
        .select(
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM").alias("month"),
            "o_totalprice",
        )
        .withColumn("seq", F.lit(0).cast("long"))
    )
    t = f"endu_{table_type}"
    engine.create_table(
        t, record_key="o_orderkey", precombine="seq", partition_by="month",
        table_type=table_type, payload="default",
        props={"write.stats_cols": "o_totalprice"},
    )
    engine.insert(o, t)

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE m AS SELECT o_orderkey, strftime(o_orderdate, '%Y-%m')"
        " AS month, o_totalprice, CAST(0 AS BIGINT) AS seq"
        f" FROM read_parquet('{sf_dir}/orders.parquet')"
    )

    months = sorted(
        r[0] for r in con.execute("SELECT DISTINCT month FROM m").fetchall()
    )

    def upsert(mod, rem, bump, seq):
        batch = (
            o.filter(F.col("o_orderkey") % mod == rem)
            .withColumn("o_totalprice", F.col("o_totalprice") + bump)
            .withColumn("seq", F.lit(seq).cast("long"))
        )
        engine.upsert(batch, t)
        con.execute(
            f"DELETE FROM m WHERE o_orderkey % {mod} = {rem}"
        )
        con.execute(
            f"INSERT INTO m SELECT o_orderkey, strftime(o_orderdate, "
            f"'%Y-%m'), o_totalprice + {bump}, {seq} "
            f"FROM read_parquet('{sf_dir}/orders.parquet') "
            f"WHERE o_orderkey % {mod} = {rem}"
        )

    def delete(mod, rem):
        engine.delete(t, f"o_orderkey % {mod} = {rem}")
        con.execute(f"DELETE FROM m WHERE o_orderkey % {mod} = {rem}")

    def overwrite_partition(month, bump, seq):
        batch = (
            o.filter(F.col("month") == month)
            .filter(F.col("o_orderkey") % 2 == 0)
            .withColumn("o_totalprice", F.col("o_totalprice") + bump)
            .withColumn("seq", F.lit(seq).cast("long"))
        )
        engine.insert_overwrite(batch, t)
        con.execute(f"DELETE FROM m WHERE month = '{month}'")
        con.execute(
            f"INSERT INTO m SELECT o_orderkey, strftime(o_orderdate, "
            f"'%Y-%m'), o_totalprice + {bump}, {seq} "
            f"FROM read_parquet('{sf_dir}/orders.parquet') "
            f"WHERE strftime(o_orderdate, '%Y-%m') = '{month}' "
            f"AND o_orderkey % 2 = 0"
        )

    def merge_mirror_month(month, bump, seq):
        src = (
            o.filter(F.col("month") == month)
            .filter(F.col("o_orderkey") % 3 != 0)
            .withColumn("o_totalprice", F.col("o_totalprice") + bump)
            .withColumn("seq", F.lit(seq).cast("long"))
        )
        engine.merge(
            t, src,
            not_matched_by_source_delete_cond=f"t.month = '{month}'",
        )
        con.execute(f"DELETE FROM m WHERE month = '{month}'")
        con.execute(
            f"INSERT INTO m SELECT o_orderkey, strftime(o_orderdate, "
            f"'%Y-%m'), o_totalprice + {bump}, {seq} "
            f"FROM read_parquet('{sf_dir}/orders.parquet') "
            f"WHERE strftime(o_orderdate, '%Y-%m') = '{month}' "
            f"AND o_orderkey % 3 != 0"
        )

    seq = 1
    for step in range(10):
        upsert(7, step % 7, 10 * (step + 1), seq); seq += 1
        if step % 3 == 0:
            delete(11, step % 11)
        if step % 4 == 1:
            overwrite_partition(months[step % len(months)], 5, seq); seq += 1
        if step % 5 == 2:
            merge_mirror_month(months[(step * 3) % len(months)], 7, seq)
            seq += 1
        # services, rotating
        if step % 3 == 1 and table_type == "mor":
            (engine.log_compact if step % 2 else engine.compact)(t)
        if step == 4:
            engine.cluster(t, ["o_totalprice"])
        if step == 5:
            engine.savepoint(t)
        if step == 6:
            engine.clean(t, retain_commits=3, stale_staging_s=0)
        if step == 7:
            engine.clean(
                t, policy="KEEP_LATEST_FILE_VERSIONS",
                retain_file_versions=2, stale_staging_s=0,
            )
        if step == 8:
            engine.archive(t, keep=5)
            # archive wrote the PARQUET checkpoint mid-workload: the
            # metadata table must agree with driver replay from here on
            from hudi_demo_spark.engine.timeline import Timeline

            cfgp = engine._resolve(t).path
            assert Timeline(cfgp).checkpoint_parquets(), "no parquet cp"
        if step >= 8:
            from hudi_demo_spark.engine.timeline import Timeline

            live = Timeline(engine._resolve(t).path).live_files()
            meta_paths = {
                r["path"] for r in engine.file_metadata(t).collect()
            }
            assert meta_paths == set(live)

    got = sorted(
        (r["o_orderkey"], r["month"], round(r["o_totalprice"], 2), r["seq"])
        for r in engine.read(t).collect()
    )
    want = sorted(
        (k, mo, round(p, 2), s)
        for k, mo, p, s in con.execute(
            "SELECT o_orderkey, month, o_totalprice, seq FROM m"
        ).fetchall()
    )
    assert len(got) == len(want)
    assert got == want
    checks = {r["check"]: r["status"] for r in engine.validate(t).collect()}
    assert all(v == "OK" for v in checks.values()), checks


def test_five_derived_consumers_share_one_source_timeline(engine, spark):
    """COMPOSITION: a rollup, a filter view, a text index, a minhash
    index and a vector index all maintained over ONE source, refreshed
    after every window of a mixed-DML sequence — each consumer tracks
    its OWN offset on the shared timeline, every mutated window folds
    into every consumer as one commit, and each end state equals a
    from-scratch rebuild. This is the case the per-view tests never
    exercise: five independent offsets walking the same commit log."""
    import numpy as np
    from pyspark.sql import functions as F

    from hudi_demo_spark.engine.derived import (
        create_filter_view,
        create_rollup,
        refresh_filter_view,
        refresh_rollup,
    )
    from hudi_demo_spark.engine.minhash_index import (
        create_minhash_index,
        lsh_band_rows,
        refresh_minhash_index,
    )
    from hudi_demo_spark.engine.text_index import (
        _stats,
        create_text_index,
        refresh_text_index,
    )
    from hudi_demo_spark.engine.vector_index import (
        _assign_cells,
        create_vector_index,
        refresh_vector_index,
    )

    rng = np.random.default_rng(5)
    rows = [
        (i, f"w{i % 9} doc {' '.join(f't{j}' for j in rng.integers(0, 30, 6))}",
         int(i % 5), [float(x) for x in rng.standard_normal(8)])
        for i in range(120)
    ]
    df = spark.createDataFrame(
        rows, "id int, text string, grp int, emb array<float>"
    )
    engine.create_table("src", record_key="id")
    create_rollup(engine, "src", "roll", ["grp"], sum_cols=[],
                  min_cols=["id"], sample_cols={"id": 3})
    create_filter_view(engine, "src", "fv", "grp >= 2", ["id", "grp", "text"])
    create_text_index(engine, "src", "tix", "id", "text", buckets=4)
    create_minhash_index(engine, "src", "mhx", "id", "text",
                         num_hashes=32, bands=8)

    def refresh_all():
        refresh_rollup(engine, "roll")
        refresh_filter_view(engine, "fv")
        refresh_text_index(engine, "tix")
        refresh_minhash_index(engine, "mhx")
        refresh_vector_index(engine, "vix")

    engine.insert(df.filter("id % 2 = 0"), "src")
    # the vector index seeds its centroids from the source at create
    # time, so it joins the family after the bootstrap batch exists
    create_vector_index(engine, "src", "vix", "id", "emb", n_centroids=4)
    refresh_all()
    engine.insert(df.filter("id % 2 = 1"), "src")
    # deliberately SKIP refreshing before more DML: consumers must fold
    # a multi-commit window (insert + update + delete) in one go
    engine.update("src", {"text": "concat(text, ' extra')",
                          "grp": "grp + 1"}, "id % 7 = 0")
    engine.delete("src", "id % 11 = 0")
    refresh_all()

    end = engine.read("src").select("id", "text", "grp", "emb").persist()
    # rollup == batch groupBy
    got_roll = {
        (r["grp"], r["n_rows"], r["min_id"])
        for r in engine.read("roll")
        .select("grp", "n_rows", F.col("min_id")).collect()
    }
    want_roll = {
        (r["grp"], r["n"], r["m"])
        for r in end.groupBy("grp")
        .agg(F.count("*").alias("n"), F.min("id").alias("m")).collect()
    }
    assert got_roll == want_roll
    # bottom-k sample == batch replay (multi-commit fold + the
    # group-moving UPDATE and DELETE through partial recompute)
    import hashlib

    from hudi_demo_spark.engine.derived import rollup_sample

    got_smp = {
        (r["grp"], r["rank"], r["id"])
        for r in rollup_sample(engine, "roll", "id").collect()
    }
    want_smp = set()
    bygrp: dict[int, list[int]] = {}
    for r in end.select("grp", "id").collect():
        bygrp.setdefault(r["grp"], []).append(r["id"])
    for g, ids in bygrp.items():
        ids.sort(key=lambda x: (hashlib.md5(str(x).encode()).hexdigest(), x))
        want_smp |= {(g, i + 1, x) for i, x in enumerate(ids[:3])}
    assert got_smp == want_smp
    # filter view == filtered snapshot
    got_fv = {tuple(r) for r in engine.read("fv")
              .select("id", "grp", "text").collect()}
    want_fv = {tuple(r) for r in end.filter("grp >= 2")
               .select("id", "grp", "text").collect()}
    assert got_fv == want_fv
    # text index scalars == corpus
    from hudi_demo_spark.functions.textfn import tokens
    n, s = _stats(engine._resolve("tix"))
    row = end.agg(F.count("*").alias("n"),
                  F.sum(F.size(tokens("text"))).alias("s")).collect()[0]
    assert (n, s) == (int(row["n"]), int(row["s"]))
    # minhash == batch banding
    mh_cfg = engine._resolve("mhx")
    want_mh = {(r["id"], r["band"], r["bucket"]) for r in lsh_band_rows(
        end, "id", "text", 32, 8).collect()}
    got_mh = {(r["id"], r["band"], r["bucket"]) for r in
              engine.read("mhx").select("id", "band", "bucket").collect()}
    assert got_mh == want_mh
    # vector index == fresh assignment under the pinned centroids
    vcfg = engine._resolve("vix")
    want_v = {(r["id"], r["cell"]) for r in _assign_cells(
        end.select("id", "emb"), vcfg).select("id", "cell").collect()}
    got_v = {(r["id"], r["cell"]) for r in
             engine.read("vix").select("id", "cell").collect()}
    end.unpersist()
    assert got_v == want_v
