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
    "q9_product_profit",
    "q13_customer_distribution",
    "rollup_pricing",
    "window_latest_per_key",
    "events_windowed_agg",
    "events_sessionize",
    "events_asof_join",
    "engine_upsert_cow",
    "engine_upsert_mor",
    "engine_delete_where",
    "engine_merge_into",
    "engine_incremental_read",
    "dedup_exact_keep_first",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "neardup_cosine_pairs",
    "similarity_topk_bruteforce",
    "similarity_topk_ivf",
    "embedding_label_centroids",
    "text_token_stats",
    "text_language_id",
    "text_fingerprint",
    "multimodal_features",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from hudi_demo_spark.plans import QUERIES
    from hudi_demo_spark.session import get_spark

    spark = get_spark("hudi_demo_spark_bench")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0)
    # warmup: JIT/codegen + parquet reader paths, outside the timings
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    from hudi_demo_spark.sources.readers import load_table

    load_table(spark, sf_dir, "nation").count()
    per_query: dict[str, float] = {}
    total = 0.0
    for name in HEADLINE:
        fn = QUERIES[name]
        t0 = time.monotonic()
        df = fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        dt = round(time.monotonic() - t0, 3)
        per_query[name] = dt
        total += dt
        print(f"[bench] {name}: {dt:.3f}s", file=sys.stderr)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": round(total, 3),
                "unit": "sec",
                "queries": per_query,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
