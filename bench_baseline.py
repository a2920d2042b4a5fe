"""Engine-vs-stock-Spark overhead measurement.

BASELINE.md's practical yardstick: absent published reference numbers,
the engine's overhead over plain PySpark parquet execution of the same
work must stay under 2x. This harness times four flagship pairs at
$SPARK_GRAFT_SF_DIR (default sf0.1) and prints ONE JSON line with the
ratios:

- ingest   : engine.insert (meta stamping + timeline commit)
             vs df.write.partitionBy().parquet
- upsert   : engine.upsert (pruning + payload window + rewrite + commit)
             vs the bare equivalent plan (read parquet, union, window,
             overwrite) with none of the bookkeeping
- snapshot : Q1-style aggregate over engine.read
             vs the same aggregate over spark.read.parquet
- increment: engine.read_incremental((begin, end]) — file-set scoped
             vs full-scan + commit-column filter (what you'd do without
             a timeline)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))


def timed_pair(fa, fb, reps=3, setup_a=None, setup_b=None):
    """min-of-reps for two functions, INTERLEAVED (a,b,a,b,...) so a
    load burst penalizes both sides equally — back-to-back laps on this
    shared box can differ 2x for identical code. setup_* run untimed
    before each rep (fresh-state resets must not count)."""
    best_a = best_b = None
    for _ in range(reps):
        if setup_a: setup_a()
        t0 = time.monotonic(); fa(); da = time.monotonic() - t0
        if setup_b: setup_b()
        t0 = time.monotonic(); fb(); db = time.monotonic() - t0
        best_a = da if best_a is None else min(best_a, da)
        best_b = db if best_b is None else min(best_b, db)
    return round(best_a, 3), round(best_b, 3)


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from hudi_demo_spark import Engine
    from hudi_demo_spark.session import get_spark
    from hudi_demo_spark.sources.readers import load_table

    spark = get_spark("bench_baseline")
    root = "/tmp/hudi_demo_spark_baseline"
    o = load_table(spark, sf_dir, "orders").withColumn(
        "seq", F.lit(1).cast("long")
    )
    o.count()  # page-cache warm
    upd = (
        o.filter(F.col("o_orderkey") % 10 == 0)
        .withColumn("o_totalprice", F.col("o_totalprice") + 100000)
        .withColumn("seq", F.lit(2).cast("long"))
    )
    results: dict[str, dict] = {}

    # --- ingest ---------------------------------------------------------
    def engine_ingest():
        shutil.rmtree(f"{root}/e_ing", ignore_errors=True)
        eng = Engine(spark, f"{root}/e_ing")
        eng.create_table("t", record_key="o_orderkey", precombine="seq",
                         partition_by="o_orderstatus")
        eng.insert(o, "t")

    def stock_ingest():
        shutil.rmtree(f"{root}/s_ing", ignore_errors=True)
        o.write.partitionBy("o_orderstatus").parquet(f"{root}/s_ing")

    e_t, s_t = timed_pair(engine_ingest, stock_ingest)
    results["ingest"] = {"engine": e_t, "stock": s_t}

    # --- upsert ---------------------------------------------------------
    engine_ingest()
    shutil.copytree(f"{root}/e_ing", f"{root}/e_pristine")
    eng = Engine(spark, f"{root}/e_ing")

    def reset_engine_table():
        # untimed: upserting into an already-upserted table reads the
        # previous rep's output too — every rep must start pristine
        shutil.rmtree(f"{root}/e_ing", ignore_errors=True)
        shutil.copytree(f"{root}/e_pristine", f"{root}/e_ing")

    def engine_upsert():
        eng.upsert(upd, "t")

    stock_ingest()

    def stock_upsert():
        base = spark.read.parquet(f"{root}/s_ing")
        w = Window.partitionBy("o_orderkey").orderBy(F.col("seq").desc())
        merged = (
            base.unionByName(upd, allowMissingColumns=True)
            .withColumn("__rn", F.row_number().over(w))
            .filter("__rn = 1").drop("__rn")
        )
        merged.write.mode("overwrite").partitionBy("o_orderstatus").parquet(
            f"{root}/s_up"
        )

    e_t, s_t = timed_pair(
        engine_upsert, stock_upsert, setup_a=reset_engine_table
    )
    results["upsert"] = {"engine": e_t, "stock": s_t}

    # --- snapshot aggregate --------------------------------------------
    def agg(df):
        (
            df.groupBy("o_orderstatus")
            .agg(F.sum("o_totalprice"), F.count("*"))
            .write.format("noop").mode("overwrite").save()
        )

    e_t, s_t = timed_pair(
        lambda: agg(eng.read("t")),
        lambda: agg(spark.read.parquet(f"{root}/s_ing")),
    )
    results["snapshot_agg"] = {"engine": e_t, "stock": s_t}

    # --- incremental read ----------------------------------------------
    eng.upsert(upd, "t")  # one change commit on the pristine base
    first = eng.show_commits("t").collect()[-1]["commit_time"]

    def engine_incr():
        eng.read_incremental("t", begin=first).write.format("noop").mode(
            "overwrite"
        ).save()

    def stock_incr():
        # without a timeline: full scan + commit-column filter + the SAME
        # latest-per-key window the incremental read guarantees
        df = eng.read("t").filter(F.col("_hoodie_commit_time") > first)
        w = Window.partitionBy("_hoodie_record_key").orderBy(
            F.col("seq").desc(), F.col("_hoodie_commit_time").desc()
        )
        (
            df.withColumn("__rn", F.row_number().over(w))
            .filter("__rn = 1").drop("__rn")
            .write.format("noop").mode("overwrite").save()
        )

    e_t, s_t = timed_pair(engine_incr, stock_incr)
    results["incremental"] = {"engine": e_t, "stock": s_t}

    # --- global upsert: record index vs range pruning -------------------
    # uuid-like keys (sha2 of the orderkey) make every file's key range
    # span the whole key space — the degenerate case for range pruning.
    # The record index should scope the rewrite to the partitions that
    # hold the batch's keys; this pair quantifies that on disk.
    u = (
        load_table(spark, sf_dir, "orders")
        .withColumn("k", F.sha2(F.col("o_orderkey").cast("string"), 256))
        .withColumn("month", F.date_format("o_orderdate", "yyyy-MM"))
        .withColumn("seq", F.lit(1).cast("long"))
        .select("k", "month", "o_totalprice", "seq")
    )
    # a POINT-UPSERT batch: ~20 keys SPREAD uniformly across the key
    # space (hash-sampled — a contiguous slice would be range pruning's
    # best case, not its failure mode), landing in ~20 of ~80 month
    # partitions. Without the index the global lookup keeps every
    # range-intersecting file (all of them, spread keys); with it, only
    # the owning partitions.
    batch = (
        u.filter(F.pmod(F.xxhash64("k"), F.lit(7500)) == 0)
        .withColumn("o_totalprice", F.col("o_totalprice") + 1)
        .withColumn("seq", F.lit(2).cast("long"))
    )

    def build_global(path, rli):
        shutil.rmtree(path, ignore_errors=True)
        g = Engine(spark, path)
        props = {"index.global": "true"}
        if rli:
            props["index.record_level"] = "true"
        g.create_table("t", record_key="k", precombine="seq",
                       partition_by="month", props=props)
        g.insert(u, "t")
        return g

    g_rli = build_global(f"{root}/g_rli", rli=True)
    g_rng = build_global(f"{root}/g_rng", rli=False)
    for p in ("g_rli", "g_rng"):
        shutil.copytree(f"{root}/{p}", f"{root}/{p}_pristine")

    def reset(p):
        shutil.rmtree(f"{root}/{p}", ignore_errors=True)
        shutil.copytree(f"{root}/{p}_pristine", f"{root}/{p}")

    metas: dict[str, dict] = {}

    def run_global(g, name):
        metas[name] = g.upsert(batch, "t")

    e_t, s_t = timed_pair(
        lambda: run_global(g_rli, "rli"),
        lambda: run_global(g_rng, "range"),
        setup_a=lambda: reset("g_rli"),
        setup_b=lambda: reset("g_rng"),
    )
    results["global_upsert_uuid_keys"] = {
        "engine": e_t,
        "stock": s_t,
        # write amplification is the metric that scales: wall-clock at
        # sf0.1 is fixed-overhead-bound (tiny files, extra index jobs),
        # but bytes rewritten grows with table size on the range path
        # and stays O(batch partitions) on the index path
        "files_rewritten": {
            "rli": len(metas["rli"]["files_removed"]),
            "range": len(metas["range"]["files_removed"]),
        },
        "bytes_written": {
            "rli": sum(f["bytes"] for f in metas["rli"]["files_added"]),
            "range": sum(f["bytes"] for f in metas["range"]["files_added"]),
        },
    }

    # --- bloom index: point upsert into overlapping key ranges ----------
    # NON-global table, uuid-like keys hashed into several files per
    # partition (write.parallelism): every file's key range spans the
    # space, so range pruning keeps all files in each batch partition.
    # The bloom filter proves which single file holds each key.
    def build_bloom(path, bloom):
        shutil.rmtree(path, ignore_errors=True)
        g = Engine(spark, path)
        props = {"write.parallelism": "8"}
        if bloom:
            props["index.bloom.enabled"] = "true"
        g.create_table("t", record_key="k", precombine="seq",
                       partition_by="month", props=props)
        g.insert(u, "t")
        return g

    b_on = build_bloom(f"{root}/b_on", bloom=True)
    b_off = build_bloom(f"{root}/b_off", bloom=False)
    for p in ("b_on", "b_off"):
        shutil.copytree(f"{root}/{p}", f"{root}/{p}_pristine")

    def run_bloom(g, name):
        metas[name] = g.upsert(batch, "t")

    e_t, s_t = timed_pair(
        lambda: run_bloom(b_on, "bloom"),
        lambda: run_bloom(b_off, "nobloom"),
        setup_a=lambda: reset("b_on"),
        setup_b=lambda: reset("b_off"),
    )
    results["bloom_point_upsert"] = {
        "engine": e_t,
        "stock": s_t,
        "files_rewritten": {
            "bloom": len(metas["bloom"]["files_removed"]),
            "nobloom": len(metas["nobloom"]["files_removed"]),
        },
        "bytes_written": {
            "bloom": sum(f["bytes"] for f in metas["bloom"]["files_added"]),
            "nobloom": sum(
                f["bytes"] for f in metas["nobloom"]["files_added"]
            ),
        },
    }

    # --- secondary index: point lookup on a non-key column --------------
    # receipt = per-row hash (each value lives in exactly one month
    # partition — the session-id-in-a-time-partitioned-log shape). The
    # indexed read prunes the scan to the owning partitions; the
    # unindexed read is the same engine path falling back to a full
    # scan + filter (per-file [min,max] can't prune uniform hashes).
    r = u.withColumn(
        "receipt", F.sha2(F.concat(F.col("k"), F.lit("r")), 256)
    )

    def build_sx(path, with_index):
        shutil.rmtree(path, ignore_errors=True)
        g = Engine(spark, path)
        g.create_table("t", record_key="k", partition_by="month")
        g.insert(r, "t")
        if with_index:
            g.create_index("t", "receipt")
        return g

    sx_on = build_sx(f"{root}/sx_on", True)
    sx_off = build_sx(f"{root}/sx_off", False)
    probe = [
        row["receipt"]
        for row in r.filter(F.pmod(F.xxhash64("k"), F.lit(7500)) == 0)
        .select("receipt").limit(20).collect()
    ]

    def lookup(g):
        (
            g.read("t", point_filter=("receipt", probe))
            .agg(F.sum("o_totalprice"))
            .collect()
        )

    e_t, s_t = timed_pair(lambda: lookup(sx_on), lambda: lookup(sx_off))
    results["secondary_index_point_lookup"] = {"engine": e_t, "stock": s_t}

    # --- functional index: derived-value range probe ---------------------
    # taxed = price * 1.07 over the month-partitioned table; clustering
    # never happened and footer stats don't exist for expressions, so
    # the unindexed probe must scan everything. The indexed probe skips
    # files whose recorded expression range cannot overlap. The table is
    # price-SORTED into files (the realistic case where expression
    # ranges are narrow per file).
    def build_fx(path, with_index):
        shutil.rmtree(path, ignore_errors=True)
        g = Engine(spark, path)
        g.create_table("t", record_key="k", partition_by="month")
        g.insert(
            r.repartitionByRange(8, "o_totalprice")
            .sortWithinPartitions("o_totalprice"),
            "t",
        )
        if with_index:
            g.create_functional_index("t", "taxed", "o_totalprice * 1.07")
        return g

    fx_on = build_fx(f"{root}/fx_on", True)
    fx_off = build_fx(f"{root}/fx_off", False)

    def fx_lookup(g, use_index):
        df = (
            g.read("t", func_filter=("taxed", 1000.0, 5000.0))
            if use_index
            else g.read("t").filter(
                F.col("o_totalprice") * 1.07 <= 5000.0
            ).filter(F.col("o_totalprice") * 1.07 >= 1000.0)
        )
        df.agg(F.sum("o_totalprice")).collect()

    e_t, s_t = timed_pair(
        lambda: fx_lookup(fx_on, True), lambda: fx_lookup(fx_off, False)
    )
    results["functional_index_range_probe"] = {"engine": e_t, "stock": s_t}

    worst = 0.0
    speedup_pairs = (
        "global_upsert_uuid_keys",
        "bloom_point_upsert",
        "secondary_index_point_lookup",
        "functional_index_range_probe",
    )
    for k, v in results.items():
        v["ratio"] = round(v["engine"] / max(v["stock"], 1e-9), 2)
        if k not in speedup_pairs:
            # index-on vs index-off are SPEEDUP pairs (engine faster),
            # not overhead ratios
            worst = max(worst, v["ratio"])
    print(json.dumps({
        "metric": "engine_overhead_vs_stock",
        "value": worst,
        "unit": "x (worst ratio, <2.0 = within baseline target)",
        "pairs": results,
        "sf": float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "")),
    }))
    shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
