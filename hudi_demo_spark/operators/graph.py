"""Iterative graph operators — connected components for near-dup
clustering.

The last step of every dedup pipeline: pair evidence (MinHash / SimHash /
Jaccard / cosine pairs) → connected components → one canonical document
per component. Spark has no built-in CC; this is the classic label-
propagation loop expressed as DataFrame joins:

- state: (node, label), label initialized to the node id;
- step: every node sends its label across its edges; each node keeps the
  MIN of its own and received labels (one keyed shuffle per iteration);
- converges in O(diameter) iterations — near-dup graphs are
  overwhelmingly small star-shaped clusters, so 3-5 iterations in
  practice; `max_iter` bounds pathological chains.

Driver involvement is one convergence COUNT per iteration (a boolean,
not data); `localCheckpoint` truncates the growing lineage every few
rounds so plans stay constant-size at any scale.
"""

from __future__ import annotations
from hudi_demo_spark.operators.util import rows_df as _rows_df

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def connected_components(
    edges: DataFrame,
    src: str = "a",
    dst: str = "b",
    max_iter: int = 20,
    checkpoint_every: int = 5,
    driver_threshold: int | None = 2_000_000,
) -> DataFrame:
    """(node, component) for every node appearing in `edges`; component =
    the smallest node id in its connected component. Undirected: edges
    are symmetrized. Deterministic.

    Adaptive execution: near-dup edge sets are a tiny fraction of the
    corpus (pairs survive LSH + verify), so when the materialized edge
    count is ≤ `driver_threshold` (2M edges ≈ 32 MB of int64 pairs) the
    loop is replaced by exact driver-side union-find — same output, none
    of the per-iteration job/shuffle overhead. Above the gate (or with
    driver_threshold=None) the distributed label-propagation loop runs;
    the count that decides this materializes the persisted edge cache
    the first iteration would have paid for anyway."""
    ed = edges.select(F.col(src).alias("s"), F.col(dst).alias("d")).persist()
    # the pair-evidence plan is the expensive part (shingle self-join);
    # persist it BEFORE symmetrizing — a union of two references to the
    # uncached subplan would execute it twice
    if driver_threshold is not None and ed.count() <= driver_threshold:
        try:
            return _driver_union_find(ed)
        finally:
            ed.unpersist()
    # one-pass symmetrize: each cached row emits both directions
    e = (
        ed.select(
            F.explode(
                F.array(
                    F.struct(F.col("s"), F.col("d")),
                    F.struct(F.col("d").alias("s"), F.col("s").alias("d")),
                )
            ).alias("e")
        )
        .select("e.s", "e.d")
        .distinct()
        .persist()
    )
    ed.unpersist()
    labels = (
        e.select(F.col("s").alias("id"))
        .distinct()
        .withColumn("label", F.col("id"))
        .persist()
    )
    converged = False
    prev_sum = None
    try:
        for i in range(max_iter):
            msgs = e.join(labels, e["s"] == labels["id"]).select(
                F.col("d").alias("id"), F.col("label")
            )
            new_labels = (
                labels.select("id", "label")
                .union(msgs)
                .groupBy("id")
                .agg(F.min("label").alias("label"))
            )
            if (i + 1) % checkpoint_every == 0:
                new_labels = new_labels.localCheckpoint()
            new_labels = new_labels.persist()
            # labels only ever DECREASE (min-propagation), so the label
            # sum is strictly monotone: equal consecutive sums ⟺ fixed
            # point. One cheap aggregate per iteration — no join against
            # the previous labels. decimal(38,0) cannot overflow below
            # ~1e19 nodes of 64-bit ids.
            cur_sum = new_labels.agg(
                F.sum(F.col("label").cast("decimal(38,0)"))
            ).first()[0]
            labels.unpersist()
            labels = new_labels
            if prev_sum is not None and cur_sum == prev_sum:
                converged = True
                break
            prev_sum = cur_sum
        if not converged:
            # silently returning intermediate labels would split one
            # component in two — fail loudly instead (long chains need
            # max_iter ≥ graph diameter).
            raise RuntimeError(
                f"connected_components did not converge in {max_iter} "
                "iterations; raise max_iter (diameter bound)"
            )
        return labels.select(
            F.col("id").alias("node"), F.col("label").alias("component")
        )
    finally:
        e.unpersist()


def _driver_union_find(e: DataFrame) -> DataFrame:
    """Exact union-find (path compression + union by min) over a
    collected edge list (any orientation, duplicates fine); returns the
    same (node, component) frame as the distributed loop. Only called
    under the size gate."""
    parent: dict = {}

    def find(x):
        r = x
        while parent[r] != r:
            r = parent[r]
        while parent[x] != r:  # path compression
            parent[x], x = r, parent[x]
        return r

    rows = e.collect()
    for r in rows:
        a, b = r["s"], r["d"]
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:  # union by min keeps component = smallest id
            if rb < ra:
                ra, rb = rb, ra
            parent[rb] = ra
    out = [(n, find(n)) for n in parent]
    schema = T.StructType(
        [
            T.StructField("node", e.schema["s"].dataType),
            T.StructField("component", e.schema["d"].dataType),
        ]
    )
    return _rows_df(e.sparkSession, out, schema)


def canonical_docs(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str,
    src: str = "a",
    dst: str = "b",
) -> DataFrame:
    """Dedup finale: keep one row per near-dup component (the min-id
    member) plus every row not in any pair. `pairs` is the (a, b)
    evidence from any pair miner."""
    cc = connected_components(pairs, src=src, dst=dst)
    losers = cc.filter(F.col("node") != F.col("component")).select(
        F.col("node").alias(id_col)
    )
    return df.join(losers, id_col, "left_anti")


def canonical_docs_by(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str,
    order_col,
    src: str = "a",
    dst: str = "b",
) -> DataFrame:
    """Quality-arbitrated dedup finale: within each near-dup component
    keep the row with the HIGHEST `order_col` (a quality/length/score
    expression), ties to the lowest id — the keep-best-duplicate policy
    production dedup pipelines use instead of keep-first (a boilerplate
    stub can carry the min id; its higher-quality twin should survive).
    Rows in no pair survive untouched.

    Scale shape: components come from the same CC machinery; the
    arbitration window shuffles only the PAIRED rows (id-keyed join
    against the membership set first), never the corpus; unpaired rows
    pass through an anti-join on the same key. Joins stay keyed — AQE
    broadcasts the membership side when it is small (the common case),
    without betting the plan on it."""
    cc = connected_components(pairs, src=src, dst=dst).withColumnRenamed(
        "node", id_col
    )
    members = df.join(cc, id_col)
    from pyspark.sql import Window

    w = Window.partitionBy("component").orderBy(
        F.col("__ord").desc(), F.col(id_col).asc()
    )
    keep_ids = (
        members.withColumn("__ord", order_col)
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(id_col)
    )
    unpaired = df.join(cc.select(id_col), id_col, "left_anti")
    return unpaired.unionByName(
        df.join(keep_ids, id_col, "left_semi")
    )
