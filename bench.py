"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line. Each query is forced end-to-end with a noop sink (full compute,
no driver materialization)."""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

HEADLINE = [
    "q1_pricing_summary",
    "q3_top_revenue_orders",
    "q5_local_supplier_volume",
    "q6_revenue_forecast",
    "q10_returned_revenue",
    "q14_promo_share",
    "q18_large_orders",
    "q8_market_share",
    "q9_product_profit",
    "q13_customer_distribution",
    "q21_waiting_suppliers",
    "rollup_pricing",
    "window_latest_per_key",
    "events_windowed_agg",
    "events_sessionize",
    "events_asof_join",
    "events_range_join",
    "engine_upsert_cow",
    "engine_upsert_mor",
    "engine_delete_where",
    "engine_merge_into",
    "engine_incremental_read",
    "engine_clustering",
    "engine_insert_overwrite",
    "engine_cdc_read",
    "engine_upsert_global",
    "engine_upsert_bloom",
    "engine_partial_update",
    "dedup_exact_keep_first",
    "dedup_semantic",
    "text_gopher_quality",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_components",
    "neardup_cosine_pairs",
    "similarity_topk_bruteforce",
    "similarity_topk_ivf",
    "embedding_label_centroids",
    "text_token_stats",
    "text_top_terms",
    "text_language_id",
    "text_fingerprint",
    "sample_split_hash",
    "corpus_seeded_shuffle",
    "sample_stratified",
    "profile_numeric_columns",
    "multimodal_features",
    "corpus_chunk_documents",
    "corpus_pack_offsets",
    "corpus_decontaminate",
    "corpus_weighted_mix",
    "corpus_term_frequencies",
    "embedding_covariance",
    "corpus_pipeline_end_to_end",
    "events_sliding_window",
    "text_unigram_logprob",
    "engine_incremental_rollup",
    "engine_secondary_index",
    "engine_functional_index",
    "text_classifier_score",
    "corpus_temperature_mix",
    "corpus_cap_per_group",
    # round 2 additions
    "multimodal_real_decode",
    "streaming_sink_native",
    # round 3 additions
    "engine_secondary_range",
    "dedup_cross_corpus",
    "ann_pq_recall",
    "engine_join_view",
    "dedup_canonical_quality",
    "multimodal_phash_dedup",
    "multimodal_afp_dedup",
    # round 4 additions
    "ann_ivfpq_recall",
    "engine_join_view_left",
    "streaming_join_view",
    "engine_dml_filegroup",
    "multimodal_jpeg_decode",
    "multimodal_png_decode",
    "engine_bloom_filegroup",
    "engine_view_prune",
    "engine_chained_rollup",
    "engine_continuous_aggregate",
    "engine_rollup_minmax",
    "engine_filter_view",
    "dedup_substring_spans",
    "dedup_substring_scrub",
    "dedup_contaminated_scrub",
    "dedup_substring_keep_first",
    "events_gap_fill_locf",
    "events_gap_fill_linear",
    "events_trailing_window",
    "streaming_continuous_aggregate",
    "streaming_rollup_sample",
    "events_json_extract",
    "grouping_sets_revenue",
    "pivot_event_type_counts",
    "engine_partition_prune",
    "events_percentiles",
    "web_url_canonicalize",
    "web_url_dedup",
    "web_domain_stats",
    "web_domain_cap",
    "text_bm25_relevance",
    "text_inverted_index",
    "engine_rollup_approx_distinct",
    "engine_snapshot_export",
    "multimodal_gif_decode",
    "text_bm25_topk",
    "text_bigram_logprob",
    "web_html_extract",
    "text_heavy_hitters",
    "multimodal_video_dedup",
    "streaming_stream_join",
    "dedup_fuzzy_titles",
    # round 5 additions
    "engine_rollup_histogram",
    "engine_rollup_percentile",
    "engine_rollup_sample",
    "engine_partition_ttl",
    "ann_indexed_topk",
    "json_source_roundtrip",
    "orc_source_roundtrip",
    "streaming_filter_view",
    "corpus_token_budget_mix",
    "streaming_dedup_exact",
    "corpus_quality_retention",
    "engine_hilbert_clustering",
    "dedup_semantic_cross_corpus",
    "corpus_cluster_balanced",
    "streaming_vector_index",
    "text_winnow_fingerprints",
    "ann_indexed_pq_recall",
    # round 6 additions
    "multimodal_jpeg_progressive",
    "text_hybrid_rrf",
    "multimodal_jpeg_throughput",
    "engine_minhash_index",
    "streaming_minhash_index",
    "engine_text_index",
    "streaming_text_index",
    "engine_text_search_batch",
    "engine_hybrid_search",
    "similarity_hard_negatives",
    "sample_leakage_safe_split",
    # round 7 additions
    "engine_index_after_cluster",
    "multimodal_jpeg_lossless",
    "dedup_admission_incremental",
    "corpus_decontam_view",
    # round 8 additions
    "multimodal_jpeg_arithmetic",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from hudi_demo_spark.plans import QUERIES
    from hudi_demo_spark.session import get_spark

    # local-iteration filter: SPARK_GRAFT_BENCH_ONLY=q1,q2 times just those
    # headline rows (driver runs leave it unset → full list, output shape
    # unchanged)
    only = os.environ.get("SPARK_GRAFT_BENCH_ONLY")
    headline = (
        [n for n in HEADLINE if n in set(only.split(","))] if only else HEADLINE
    )

    spark = get_spark("hudi_demo_spark_bench")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0)
    # warmup: JIT/codegen + parquet reader + OS page cache for every input
    # table, outside the timings — so per-query numbers measure compute,
    # not first-touch IO of whichever query happens to run first
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    from hudi_demo_spark.sources.readers import load_table

    for t in ["nation", "region", "supplier", "part", "customer", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        load_table(spark, sf_dir, t).count()
    # warmup lap: run every query once so the timed lap measures
    # steady-state throughput, not whole-stage-codegen JIT compilation of
    # each plan's generated code (2-4s per novel plan shape, a one-time
    # driver cost that vanishes over any real workload's lifetime).
    # Disable with SPARK_GRAFT_BENCH_WARM=0.
    if os.environ.get("SPARK_GRAFT_BENCH_WARM", "1") != "0":
        for name in headline:
            try:
                QUERIES[name](spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
            except Exception as ex:  # pragma: no cover
                print(f"[bench] warmup {name} failed: {ex}", file=sys.stderr)
    # timed: min of 3 runs per query — ambient load on this box moves
    # queries ±30%, far above the signal for sub-second queries;
    # per-query min-over-repetitions makes round-over-round deltas
    # attributable without manual interleaved re-runs (fixtures cached
    # between laps keep the cost bounded)
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))
    per_query: dict[str, float] = {}
    # Deterministic work-volume alongside the noisy wall: Spark job and
    # task counts for ONE rep of each gate, via SparkStatusTracker. Wall
    # times on this box swing 1.5-2x with ambient load (BASELINE.md bench
    # discipline); job/task counts don't — a round-over-round diff of
    # these attributes a regression to added work vs box noise without a
    # hand-run interleaved A/B. Counted per job-group, so jobs launched
    # from OTHER threads (Structured Streaming's execution threads) are
    # not included — streaming gates' counts cover their driver-thread
    # setup/read jobs only.
    per_query_shape: dict[str, dict] = {}
    tracker = spark.sparkContext.statusTracker()
    errors: list[str] = []
    total = 0.0
    for name in headline:
        fn = QUERIES[name]
        best = None
        shape = None
        try:
            for rep in range(max(1, reps)):
                group = f"bench:{name}:{rep}"
                spark.sparkContext.setJobGroup(group, name)
                t0 = time.monotonic()
                df = fn(spark, sf_dir)
                df.write.format("noop").mode("overwrite").save()
                dt = time.monotonic() - t0
                best = dt if best is None else min(best, dt)
                if rep == 0:
                    jids = tracker.getJobIdsForGroup(group)
                    tasks = 0
                    for jid in jids:
                        ji = tracker.getJobInfo(jid)
                        for sid in ji.stageIds if ji else ():
                            si = tracker.getStageInfo(sid)
                            tasks += si.numTasks if si else 0
                    shape = {"jobs": len(jids), "tasks": tasks}
        except Exception as ex:
            # one broken query must not lose the JSON for the others
            print(f"[bench] {name} FAILED: {ex}", file=sys.stderr)
            errors.append(name)
            continue
        finally:
            spark.sparkContext.setJobGroup("bench:idle", "between gates")
        best = round(best, 3)
        per_query[name] = best
        per_query_shape[name] = {"sec": best, **(shape or {})}
        total += best
        print(
            f"[bench] {name}: {best:.3f}s "
            f"{shape['jobs']}j/{shape['tasks']}t" if shape else
            f"[bench] {name}: {best:.3f}s",
            file=sys.stderr,
        )
    # Per-query detail goes three places so it SURVIVES to the driver
    # (round-10 postmortem: the stdout line had only the total, stderr is
    # tail-truncated, and the c8 scaling run overwrote BENCH_DETAIL.json —
    # the driver ended up with per_query={} and no scaling signal):
    # 1. the stdout JSON line itself carries `queries` (~5 KB at 147
    #    entries — well inside the capture window that truncated the
    #    round-2 65-entry + shapes + errors stderr dump);
    # 2. BENCH_DETAIL_c{cpus}.json, keyed by core count so the low-cpus
    #    scaling lap no longer clobbers the main lap's detail;
    # 3. BENCH_DETAIL.json kept as the latest-run alias (existing
    #    consumers/detail_file pointer unchanged).
    detail = {
        "metric": "headline_queries_total",
        "value": round(total, 3),
        "unit": "sec",
        "queries": per_query,
        # per-gate {sec, jobs, tasks}: jobs/tasks are the deterministic
        # work-volume signal (rep-0 job group) — diff THESE across
        # rounds; walls alone are ambient-load-noisy on this box
        "shapes": per_query_shape,
        "sf": sf,
        "cpus": spark.sparkContext.defaultParallelism,
    }
    if errors:
        detail["errors"] = errors
    here = Path(__file__).resolve().parent
    for fname in ("BENCH_DETAIL.json", f"BENCH_DETAIL_c{detail['cpus']}.json"):
        try:
            (here / fname).write_text(json.dumps(detail, indent=1))
        except OSError as ex:  # pragma: no cover
            print(f"[bench] could not write {fname}: {ex}", file=sys.stderr)
    print(f"[bench] detail: {json.dumps(detail)}", file=sys.stderr)
    out = {
        "metric": "headline_queries_total",
        "value": round(total, 3),
        "unit": "sec",
        "queries": per_query,
        "sf": sf,
        "n_queries": len(per_query),
        "detail_file": "BENCH_DETAIL.json",
    }
    if errors:
        out["n_errors"] = len(errors)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
