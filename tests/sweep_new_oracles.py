"""One-off sweep: run the newly-oracled queries at sf0.01 AND sf0.1 and
compare bit-exactly against DuckDB — the same comparison the driver's
correctness gate performs (tests/test_oracle.py does this at sf0.001).
Usage: python tests/sweep_new_oracles.py [query ...]"""

import math
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import duckdb

from hudi_demo_spark.plans import ORACLES, QUERIES
from hudi_demo_spark.session import get_spark

NEW = [
    "dedup_minhash_lsh", "dedup_simhash", "similarity_topk_lsh",
    "similarity_topk_ivf", "corpus_chunk_documents", "corpus_pack_offsets",
    "corpus_decontaminate", "corpus_repetition_score", "corpus_redact_pii",
    "corpus_weighted_mix", "corpus_term_frequencies", "embedding_covariance",
    "corpus_pipeline_end_to_end", "events_sliding_window",
    "text_unigram_logprob",
]

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def _norm(v):
    if isinstance(v, float):
        return "nan" if math.isnan(v) else round(v, 6)
    return v


def _canon(rows, cols):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_norm(r[i]) for i in idx) for r in rows)


def main():
    names = sys.argv[1:] or NEW
    spark = get_spark("sweep")
    fails = 0
    for sf in ["/root/testdata/sf0.01", "/root/testdata/sf0.1"]:
        con = duckdb.connect()
        for t in TABLES:
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
        for name in names:
            sdf = QUERIES[name](spark, sf)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
            res = con.execute(ORACLES[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
            ok = (
                sorted(scols) == sorted(ocols)
                and len(srows) == len(orows)
                and _canon(srows, scols) == _canon(orows, ocols)
            )
            print(f"{sf.split('/')[-1]} {name}: "
                  f"{'OK' if ok else 'MISMATCH'} ({len(srows)} rows)")
            fails += 0 if ok else 1
    print("FAILURES:", fails)
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
