"""Similarity search over embedding columns (array<float>).

- brute-force cosine top-k: the exact baseline. crossJoin(queries ×
  corpus) is fine when queries is small (broadcast); rank via window.
- cosine near-dup pairs: optional blocking column (e.g. a cluster label
  or LSH bucket) turns O(n²) into Σ block².
- bit-sampling LSH ANN: deterministic sign-pattern bucket over sampled
  dimensions; bucket-join then exact re-rank inside buckets — the scale
  path (recall traded for a keyed join instead of a crossJoin).

All vector math is `zip_with`/`aggregate` (JVM, codegen) — see
functions.vectorfn. At 100 TB the corpus side partitions by bucket and
the query side broadcasts; no shuffle of the big side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from hudi_demo_spark.functions.vectorfn import cosine_similarity, dot_product, l2_norm


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Exact top-k neighbors per query: (query_id, neighbor_id, score, rank).
    Ties broken by neighbor id for determinism. The query side is
    broadcast — the corpus is never shuffled."""
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qv")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cv")
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("score", cosine_similarity("__qv", "__cv"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "score", "rank")
    )


def cosine_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.9,
    block_col: str | None = None,
) -> DataFrame:
    """Near-duplicate pairs (a, b, score ≥ threshold), a < b. With
    `block_col`, the join is keyed by the block (e.g. label or LSH
    bucket) instead of a full crossJoin."""
    cols = [F.col(id_col).alias("id"), F.col(vec_col).alias("v")]
    if block_col:
        cols.append(F.col(block_col).alias("blk"))
    base = df.select(*cols)
    l = base.alias("l")
    r = base.alias("r")
    on = [F.col("l.blk") == F.col("r.blk")] if block_col else []
    cond = F.col("l.id") < F.col("r.id")
    joined = (
        l.join(r, on[0] if on else cond, "inner")
        if on
        else l.crossJoin(r)
    )
    return (
        joined.filter(cond)
        .withColumn("score", cosine_similarity("l.v", "r.v"))
        .filter(F.col("score") >= threshold)
        .select(F.col("l.id").alias("a"), F.col("r.id").alias("b"), "score")
    )


def lsh_bucket(vec_col: str, dims: list[int]) -> F.Column:
    """Deterministic bit-sampling bucket: sign pattern of the vector at
    the sampled dimensions (cosine-LSH by coordinate hyperplanes)."""
    bits = [
        F.when(F.element_at(vec_col, d + 1) >= 0, F.lit(1 << i)).otherwise(F.lit(0))
        for i, d in enumerate(dims)
    ]
    out = None
    for b in bits:
        out = b if out is None else out + b
    return out.alias("bucket")


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    num_tables: int = 8,
    bits_per_table: int = 4,
) -> DataFrame:
    """Approximate top-k with OR-amplified multi-table LSH: `num_tables`
    independent sign-pattern tables (disjoint sampled dims); a pair is a
    candidate if it collides in ANY table; exact cosine re-rank over the
    deduped candidate set. Recall grows with num_tables at the cost of
    candidate volume; the keyed join replaces the crossJoin (the 100 TB
    path — corpus partitions by (table, bucket), queries broadcast)."""

    def tables(df, idalias):
        buckets = F.array(
            *[
                F.struct(
                    F.lit(t).alias("tbl"),
                    lsh_bucket(
                        vec_col,
                        [ (t * bits_per_table + j) % 64 for j in range(bits_per_table) ],
                    ),
                )
                for t in range(num_tables)
            ]
        )
        return df.select(
            F.col(id_col).alias(idalias),
            F.col(vec_col).alias(f"__{idalias}_v"),
            F.explode(buckets).alias("tb"),
        ).select(idalias, f"__{idalias}_v", "tb.tbl", "tb.bucket")

    c = tables(corpus, "neighbor_id")
    q = tables(queries, "query_id")
    cands = (
        c.join(F.broadcast(q), ["tbl", "bucket"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", "__query_id_v", "__neighbor_id_v")
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    scored = cands.withColumn(
        "score", cosine_similarity("__query_id_v", "__neighbor_id_v")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "score", "rank")
    )
