"""Physical-plan assertions: the scale properties SURVEY §4 relies on
must actually appear in the executed plans — filter pushdown to the
parquet scan, column pruning, broadcast joins for small dims, whole-stage
codegen in the hot path, and metadata-level partition pruning in the
engine read path. A regression here is a 100×-at-scale bug even when
results stay correct."""

import io
from contextlib import redirect_stdout

from pyspark.sql import functions as F

from hudi_demo_spark.plans import QUERIES
from hudi_demo_spark.sources.readers import load_table


def plan_of(df, mode="formatted") -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


def test_filter_pushdown_reaches_parquet_scan(spark, sf_dir):
    df = QUERIES["q6_revenue_forecast"](spark, sf_dir)
    plan = plan_of(df)
    assert "PushedFilters:" in plan
    pushed = [ln for ln in plan.splitlines() if "PushedFilters:" in ln]
    assert any("l_shipdate" in ln for ln in pushed), pushed
    assert any("l_quantity" in ln for ln in pushed), pushed


def test_column_pruning_in_read_schema(spark, sf_dir):
    df = QUERIES["top_k_orders"](spark, sf_dir)
    plan = plan_of(df)
    schema_lines = [ln for ln in plan.splitlines() if "ReadSchema:" in ln]
    assert schema_lines
    line = schema_lines[0]
    assert "o_orderkey" in line and "o_totalprice" in line
    # the 2-column projection must not drag the rest of the table along
    assert "o_custkey" not in line and "o_orderdate" not in line


def test_small_dim_joins_are_broadcast(spark, sf_dir):
    plan = plan_of(QUERIES["q14_promo_share"](spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_semi_join_planned_for_exists(spark, sf_dir):
    plan = plan_of(QUERIES["q4_order_priority"](spark, sf_dir))
    assert "LeftSemi" in plan


def test_anti_join_planned_for_not_exists(spark, sf_dir):
    plan = plan_of(QUERIES["q22_sales_opportunity"](spark, sf_dir))
    assert "LeftAnti" in plan


def test_whole_stage_codegen_in_agg_path(spark, sf_dir):
    df = QUERIES["q1_pricing_summary"](spark, sf_dir)
    # map-side combine: aggregation must be partial before the exchange
    assert "partial_sum" in plan_of(df, "simple")
    assert "WholeStageCodegen" in plan_of(df, "codegen")


def test_range_join_is_equi_join_not_nested_loop(spark, sf_dir):
    plan = plan_of(QUERIES["events_range_join"](spark, sf_dir))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_asof_join_single_shuffle_no_join_node(spark, sf_dir):
    """The as-of union+window form must not contain any join operator —
    one exchange on the key, then a window."""
    plan = plan_of(QUERIES["events_asof_join"](spark, sf_dir), "simple")
    assert "Join" not in plan
    assert "Window" in plan


def test_engine_read_prunes_partitions_at_metadata_level(engine, spark, sf_dir):
    """partition_filter must shrink the FILE LIST (not just add a filter):
    the scan's input files are only the matching partition's."""
    e = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value"
    )
    engine.create_table("t", record_key="event_id", partition_by="event_type")
    engine.insert(e, "t")
    pruned = engine.read(
        "t", partition_filter="_hoodie_partition_path = 'event_type=view'"
    )
    files = pruned.inputFiles()
    assert files and all("event_type=view" in f for f in files)
    full = engine.read("t")
    assert len(full.inputFiles()) > len(files)


def test_decontaminate_broadcasts_eval_shingles(spark, sf_dir):
    # the 100-TB train side must never shuffle: eval shingles broadcast
    # into a map-side semi join
    plan = plan_of(QUERIES["corpus_decontaminate"](spark, sf_dir))
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan
    assert "SortMergeJoin" not in plan


def test_pack_offsets_has_no_global_window_over_docs(spark, sf_dir):
    # the doc-level cumsum windows must be partitioned by range bucket;
    # a global ORDER-BY window (single partition over the corpus) may
    # only appear for the n_buckets-row base-offset table
    from hudi_demo_spark.operators.corpus import pack_offsets

    d = load_table(spark, sf_dir, "documents")
    df = pack_offsets(d, "doc_id", "text", seq_len=64, n_buckets=32)
    plan = plan_of(df, "extended")
    windows = [ln for ln in plan.splitlines() if "Window [" in ln or "Window ["
               in ln.replace("AdaptiveSparkPlan", "")]
    doc_windows = [ln for ln in windows if "__b" in ln and "partitionBy" not in ln]
    # per-bucket window present (specified by __b), and the only
    # unpartitioned window works on the bucket totals (__tot aggregate)
    assert any("__cum" in ln or "_we0" in ln for ln in windows), windows
    unpartitioned = [ln for ln in windows if "windowspecdefinition(__b" not in ln
                     and "partitionspec" not in ln]
    for ln in unpartitioned:
        assert "__tot" in ln or "__base" in ln or "__b" in ln, ln


def test_chunking_is_shuffle_free(spark, sf_dir):
    plan = plan_of(QUERIES["corpus_chunk_documents"](spark, sf_dir))
    # explode + project only — no Exchange other than the final orderBy's
    # range partitioning
    assert "Generate" in plan and "explode(" in plan
    assert "hashpartitioning" not in plan


def test_seeded_shuffle_windows_are_bucket_partitioned(spark, sf_dir):
    # the permutation must come from per-bucket windows + a broadcast
    # base-offset join — never a single-partition global window
    from hudi_demo_spark.operators.sampling import seeded_shuffle

    d = load_table(spark, sf_dir, "documents").select("doc_id")
    df = seeded_shuffle(d, "doc_id", seed=7)
    plan = plan_of(df, "extended")
    windows = [ln for ln in plan.splitlines() if "windowspecdefinition" in ln]
    assert windows
    for ln in windows:
        assert "__ss_b" in ln, ln  # partitioned by the hash-prefix bucket
    assert "BroadcastHashJoin" in plan_of(df) or "broadcast" in plan_of(df)


def test_stratified_sample_single_keyed_shuffle(spark, sf_dir):
    from hudi_demo_spark.operators.sampling import stratified_sample

    d = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    plan = plan_of(stratified_sample(d, "doc_id", "lang", 5))
    # exactly one exchange: the window's hashpartitioning on the stratum
    assert plan.count("Exchange (") == 1, plan
    assert "hashpartitioning(lang" in plan
    # bonus property: Spark's WindowGroupLimit prunes to top-n map-side
    # BEFORE the shuffle — the shuffle moves ≤ n rows per stratum
    assert "WindowGroupLimit" in plan


def test_classifier_score_is_udf_free_single_projection(spark, sf_dir):
    """The hashed linear classifier must stay JVM-side: no Python eval
    nodes, no shuffle — one codegen'd projection over the scan."""
    df = QUERIES["text_classifier_score"](spark, sf_dir)
    plan = plan_of(df)
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # the only exchange is the final orderBy's range partitioning; the
    # scoring itself must not introduce a keyed (hash) shuffle
    assert "hashpartitioning" not in plan, plan
    assert plan.count("rangepartitioning") <= 1, plan


def test_length_batches_windows_are_subbucket_partitioned(spark, sf_dir):
    """The per-doc row_number window must be partitioned by (bucket,
    sub-bucket); the only coarser window runs on the (buckets × n_sub)
    base-offset aggregate."""
    from hudi_demo_spark.operators.corpus import length_batches

    d = load_table(spark, sf_dir, "documents")
    df = length_batches(d, "doc_id", "text")
    plan = plan_of(df, "extended")
    windows = [ln for ln in plan.splitlines() if "windowspecdefinition(" in ln]
    assert windows
    for ln in windows:
        # every window is partitioned: either (bucket, __s) for doc rows
        # or (bucket) for the tiny offsets aggregate — never global
        assert "windowspecdefinition(bucket" in ln, ln


def test_cross_corpus_join_is_shingle_keyed(spark, sf_dir):
    """The two-corpus contamination screen must candidate-generate via a
    shingle-keyed join — never a cartesian pair enumeration."""
    from hudi_demo_spark.operators.dedup import cross_corpus_jaccard_pairs

    d = load_table(spark, sf_dir, "documents")
    df = cross_corpus_jaccard_pairs(
        d.filter("doc_id % 3 != 0"), d.filter("doc_id % 3 = 0"),
        "doc_id", "text", threshold=0.1,
    )
    plan = plan_of(df, "extended")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_pq_adc_scan_broadcasts_queries_only(spark, sf_dir):
    """PQ's ADC stage is a broadcast of the tiny query side over the
    encoded corpus: the corpus must not shuffle before scoring, and the
    refine joins must not be cartesian."""
    from hudi_demo_spark.operators.similarity import pq_topk, pq_train

    e = load_table(spark, sf_dir, "embeddings")
    books = pq_train(e, "vec_id", "embedding", m=4, codes=8, iters=1,
                     sample_mod=8)
    df = pq_topk(e, e.filter("vec_id < 3"), "vec_id", "embedding",
                 k=3, codebooks=books, rerank=2)
    plan = plan_of(df, "extended")
    # the only nested-loop is the deliberate broadcast ADC cross join
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastNestedLoopJoin") <= 1


def test_secondary_range_probe_prunes_before_scan(spark, tmp_path):
    """read(range_filter) on an indexed column must shrink the FILE LIST
    (metadata-level pruning), not just add a row filter."""
    from pyspark.sql import functions as SF

    from hudi_demo_spark.engine import Engine

    eng = Engine(spark, tmp_path / "lake")
    eng.create_table("t", record_key="id", precombine="ts",
                     partition_by="dt")
    rows = [(i, f"c{i}", float(i), i, f"2022-01-{1 + i % 5:02d}")
            for i in range(1, 31)]
    eng.insert(spark.createDataFrame(
        rows, "id int, city string, price double, ts long, dt string"), "t")
    eng.sql("create index idx_ts on t using secondary_index (ts)")
    # the pruned scan reads strictly fewer parquet FILES than the
    # unfiltered snapshot — metadata-level pruning, not a row filter
    full_files = eng.read("t").inputFiles()
    pruned_files = eng.read("t", range_filter=("ts", 1, 1)).inputFiles()
    assert len(full_files) > len(pruned_files) >= 1
    assert all("2022-01-02" in f for f in pruned_files)  # ts=1 partition


def test_bm25_topk_broadcasts_query_side_only(spark, sf_dir):
    """Size-independent plan properties of the retrieval join: the
    corpus token explode is pruned by a broadcast SEMI-join before any
    aggregation (so un-queried terms never reach a shuffle), the only
    cross join is the single-row corpus-stats attach, per-query top-k
    runs as a group-limited window, and no Python in the plan."""
    plan = plan_of(QUERIES["text_bm25_topk"](spark, sf_dir))
    assert "LeftSemi" in plan                       # term prune pre-agg
    assert "CartesianProduct" not in plan
    # formatted mode prints each node in tree AND detail — count headers
    assert plan.count(") BroadcastNestedLoopJoin") <= 1  # 1-row stats only
    assert "WindowGroupLimit" in plan               # rank<=k pushed down
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_bigram_logprob_plan_is_codegen_joins(spark, sf_dir):
    """Bigram extraction and scoring never leave the JVM (no Python
    eval), and the only cross join is the single-row vocab scalar. The
    big bigram-table join strategy is AQE's call (broadcast at fixture
    scale, shuffle at corpus scale) — what must hold at every size is
    the join-based shape, not a driver-side collect."""
    plan = plan_of(QUERIES["text_bigram_logprob"](spark, sf_dir))
    assert "BroadcastHashJoin" in plan or "SortMergeJoin" in plan
    assert plan.count(") BroadcastNestedLoopJoin") <= 1  # 1-row vocab only
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_inverted_index_single_term_shuffle(spark, sf_dir):
    """term → postings is two passes: a per-term df aggregate filters
    the term set BEFORE the collect_list pass joins back to it — the
    shape that guarantees no stop-term posting list ever materializes.
    The join must be an equi-join (hash or sort-merge; AQE's call at
    scale), never a cartesian, and no Python stage anywhere."""
    df = QUERIES["text_inverted_index"](spark, sf_dir)
    plan = plan_of(df)
    assert "BroadcastHashJoin" in plan or "SortMergeJoin" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # collect_list appears exactly once (the postings pass), and only
    # AFTER the df-filter side exists — two aggregate stages minimum
    assert plan.count("collect_list") >= 1


def test_heavy_hitters_scale_shape(spark, sf_dir):
    """The recount join must be a BROADCAST of the bounded candidate
    set (never a corpus shuffle or cartesian), and the only Python
    stage is the Arrow-batched Misra-Gries candidate miner."""
    from hudi_demo_spark.functions.textfn import tokens
    from hudi_demo_spark.operators.profile import heavy_hitters

    d = load_table(spark, sf_dir, "documents")
    toks = d.select(F.explode(tokens("text")).alias("term"))
    plan = plan_of(heavy_hitters(toks, "term", 0.02))
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan  # candidates are broadcast-sized
    # exactly one Python stage: the MG miner (formatted plans print each
    # node twice — once in the tree, once in the details)
    assert plan.count("MapInPandas") == 2
    assert "BatchEvalPython" not in plan


def test_edit_near_pairs_scale_shape(spark, sf_dir):
    """Candidates come from an equi-join on variant hashes — never a
    cartesian — and the whole neighborhood expansion is codegen (no
    Python stage of any kind)."""
    from hudi_demo_spark.operators.dedup import edit_near_pairs

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.substring("text", 1, 24).alias("t")
    )
    plan = plan_of(edit_near_pairs(d, "doc_id", "t", max_edit=2))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "MapInPandas" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_video_near_dups_frame_aligned_blocking(spark):
    """The Hamming miner's join key must include the frame index (the
    group column shrinks buckets instead of growing candidates)."""
    import numpy as np

    from hudi_demo_spark.operators import multimodal as mm

    base = np.random.default_rng(5).integers(
        40, 200, size=(2, 16, 16)
    ).astype(np.uint8)
    media = spark.createDataFrame(
        [(1, mm.encode_y4m(base, colorspace="mono"))],
        "media_id long, payload binary",
    )
    plan = plan_of(mm.video_near_dups(media))
    # join keys: chunk, key, frame_idx — all three in one equi-join
    assert "frame_idx" in plan
    assert "CartesianProduct" not in plan


def test_token_budget_mix_plan_shape(spark, sf_dir):
    """The mixture planner's only heavy operation is the per-group
    prefix window: the plan carries exactly one window over the corpus,
    joins the tiny plan table by broadcast, and stays JVM-side (the
    per-group totals are a bounded driver collect, not a plan node)."""
    from hudi_demo_spark.operators.sampling import token_budget_mix

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars"
    )
    out = token_budget_mix(
        d, "doc_id", "source", "n_chars",
        {"src1": 0.5, "src2": 0.5}, 10_000,
    )
    plan = plan_of(out)
    assert plan.count(") Window") == 1
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_cluster_balanced_sample_plan_shape(spark, sf_dir):
    """Cluster-balanced sampling never joins the corpus: the assignment
    is a map-side projection against literal centroids, and the cap is
    one keyed window with the rank<=cap limit pushed into the shuffle
    (WindowGroupLimit)."""
    from hudi_demo_spark.operators.similarity import (
        cluster_balanced_sample,
    )

    e = load_table(spark, sf_dir, "embeddings")
    out = cluster_balanced_sample(e, "vec_id", "embedding",
                                  n_clusters=8, cap=10)
    plan = plan_of(out)
    assert ") Window" in plan and "WindowGroupLimit" in plan
    for bad in ("Join", "CartesianProduct", "BatchEvalPython",
                "ArrowEvalPython"):
        assert bad not in plan, bad


def test_cross_corpus_cosine_broadcasts_eval_only(spark, sf_dir):
    """The semantic contamination screen joins train (table, bucket)
    memberships against a BROADCAST eval side — never a cross product,
    no Python, and candidate dedup is a keyed aggregate."""
    from hudi_demo_spark.operators.similarity import (
        cross_corpus_cosine_pairs,
    )

    e = load_table(spark, sf_dir, "embeddings")
    out = cross_corpus_cosine_pairs(
        e.filter(F.col("vec_id") % 5 != 0),
        e.filter(F.col("vec_id") % 5 == 0),
        "vec_id", "embedding", threshold=0.3,
    )
    plan = plan_of(out)
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
