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
from hudi_demo_spark.operators.util import spread as _spread


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
    c = _spread(
        corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cv"))
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
    num_buckets: int = 8,
) -> DataFrame:
    """Near-duplicate pairs (a, b, score ≥ threshold), a < b. With
    `block_col`, the join is keyed by the block (e.g. a cluster label or
    LSH bucket) instead of a full crossJoin.

    Parallelism does NOT depend on the number of blocks: rows are salted
    into `num_buckets` triangle buckets, so each block's O(|block|²) pair
    work spreads over num_buckets·(num_buckets+1)/2 join keys — one giant
    block cannot serialize onto a single task (the skew case at 100 TB).
    Each row is replicated num_buckets+1 times; raise num_buckets when
    blocks are huge, lower it when replication dominates.

    Norms are computed once per ROW before the join (not twice per pair);
    the per-pair score expression dot(a,b)/(norm_a·norm_b) is unchanged,
    so values are bit-identical to the naive form."""
    cols = [F.col(id_col).alias("id"), F.col(vec_col).alias("v")]
    if block_col:
        cols.append(F.col(block_col).alias("blk"))
    base = _spread(df.select(*cols)).withColumn("__n", l2_norm("v"))
    s = num_buckets
    bucket = F.pmod(F.xxhash64(F.col("id")), F.lit(s)).cast("int")
    base = base.withColumn("__b", bucket)
    keys = (["blk"] if block_col else []) + ["__lo", "__hi"]
    # triangle join: row in bucket b is on the left for keys (b, b..s-1)
    # and on the right for keys (0..b, b); an unordered pair with buckets
    # (x ≤ y) meets exactly once, at key (x, y) — twice when x == y,
    # deduped by the id ordering below.
    l = base.select(
        F.col("id").alias("id_a"),
        F.col("v").alias("v_a"),
        F.col("__n").alias("n_a"),
        F.col("__b").alias("b_a"),
        *([F.col("blk")] if block_col else []),
        F.col("__b").alias("__lo"),
        F.explode(F.sequence(F.col("__b"), F.lit(s - 1))).alias("__hi"),
    )
    r = base.select(
        F.col("id").alias("id_b"),
        F.col("v").alias("v_b"),
        F.col("__n").alias("n_b"),
        F.col("__b").alias("b_b"),
        *([F.col("blk")] if block_col else []),
        F.explode(F.sequence(F.lit(0), F.col("__b"))).alias("__lo"),
        F.col("__b").alias("__hi"),
    )
    pairs = l.join(r, keys).filter(
        (F.col("b_a") < F.col("b_b")) | (F.col("id_a") < F.col("id_b"))
    )
    score = dot_product("v_a", "v_b") / (F.col("n_a") * F.col("n_b"))
    return (
        pairs.withColumn("score", score)
        .filter(F.col("score") >= threshold)
        .select(
            F.least("id_a", "id_b").alias("a"),
            F.greatest("id_a", "id_b").alias("b"),
            "score",
        )
    )


def ivf_assign(
    df: DataFrame,
    centroids: list[tuple[int, list[float]]],
    id_col: str,
    vec_col: str,
    n_probe: int = 1,
    extra_cols: list[str] | None = None,
) -> DataFrame:
    """Assign each vector to its `n_probe` nearest centroids:
    (id, vec, centroid_id, centroid_rank). The centroids are a plan-level
    LITERAL (n_centroids × dim floats — tiny), so the assignment is pure
    map-side expression work: no crossJoin, no window, no shuffle of the
    big side. Ranking is cosine desc, centroid_id asc (ties), computed
    per row via sort_array over (score, -id) structs.

    Normalizing by the row's own norm is skipped — it is a common factor
    across that row's centroid scores and cannot change the ranking.

    The whole scoring array is built as ONE parsed SQL expression instead
    of composed Column objects: n_centroids × dim literal floats composed
    via the Python API cost one driver round-trip EACH (measured ~2.5 s
    of pure plan construction for 16×64 at sf0.1); a single expr() parse
    is milliseconds. Float literals use repr() (exact round-trip), so the
    plan is bit-identical to the composed form."""
    import math

    def _d(x: float) -> str:
        return repr(float(x)) + "D"

    terms = []
    for cid, vec in centroids:
        arr = ",".join(_d(x) for x in vec)
        norm = math.sqrt(sum(float(x) * float(x) for x in vec)) or 1.0
        terms.append(
            "named_struct('s', aggregate(zip_with(`{v}`, array({a}), "
            "(x, y) -> CAST(x AS DOUBLE) * y), 0D, (acc, x) -> acc + x) "
            "/ {n}, 'negid', {negid})".format(
                v=vec_col, a=arr, n=_d(norm), negid=-cid
            )
        )
    probes = F.expr(
        f"slice(sort_array(array({','.join(terms)}), false), 1, {n_probe})"
    )
    extras = list(extra_cols or [])
    return df.select(
        F.col(id_col),
        F.col(vec_col).alias("__v"),
        *[F.col(c) for c in extras],
        F.posexplode(probes).alias("__p", "__c"),
    ).select(
        id_col,
        "__v",
        *extras,
        (-F.col("__c.negid")).cast("int").alias("centroid_id"),
        (F.col("__p") + 1).alias("centroid_rank"),
    )


def seed_centroids(
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    n_centroids: int,
) -> list[tuple[int, list[float]]]:
    """Deterministic seed centroids: md5-derived portable-hash order (so
    a DuckDB oracle re-derives the exact same seed set; id = tiebreak),
    numbered 1..n in id order. Driver-side by design — n_centroids x dim
    floats. At scale, replace with k-means iterations on the same
    plumbing."""
    from hudi_demo_spark.functions.hashfn import portable_hash60

    seed_rows = (
        corpus.select(F.col(id_col).alias("__cid"), F.col(vec_col).alias("__cv"))
        .orderBy(portable_hash60(F.col("__cid").cast("string")), F.col("__cid"))
        .limit(n_centroids)
        .collect()
    )
    return [
        (i + 1, list(r["__cv"]))
        for i, r in enumerate(sorted(seed_rows, key=lambda r: r["__cid"]))
    ]


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_centroids: int = 16,
    n_probe: int = 4,
) -> DataFrame:
    """Approximate top-k via an IVF (inverted-file) index — the standard
    ANN scale path (see PAPERS.md; e.g. IVF-Flat in Faiss terms):

    1. pick `n_centroids` deterministic seed centroids (hash-ordered
       sample of the corpus — at scale, replace with k-means iterations,
       same plumbing);
    2. partition the corpus into cells: each vector computes its nearest
       centroid map-side against the literal centroid array (no join, no
       shuffle of the corpus);
    3. each query probes its `n_probe` nearest cells;
    4. exact cosine re-rank only inside probed cells — the corpus-side
       join is keyed by centroid_id, so cost is n_probe/n_centroids of
       brute force, and the big side shuffles once on the cell key.

    Recall is tunable with n_probe (n_probe = n_centroids degenerates to
    exact search)."""
    cents = seed_centroids(corpus, id_col, vec_col, n_centroids)
    c = ivf_assign(_spread(corpus), cents, id_col, vec_col, n_probe=1).select(
        F.col(id_col).alias("neighbor_id"),
        F.col("__v").alias("__nv"),
        "centroid_id",
    )
    q = ivf_assign(queries, cents, id_col, vec_col, n_probe=n_probe).select(
        F.col(id_col).alias("query_id"), F.col("__v").alias("__qv"), "centroid_id"
    )
    scored = (
        c.join(F.broadcast(q), "centroid_id")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("score", cosine_similarity("__qv", "__nv"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "score", "rank")
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


def _lsh_tables(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    idalias: str,
    num_tables: int,
    bits_per_table: int,
) -> DataFrame:
    """Explode each row into its (table, bucket) memberships across
    `num_tables` sign-pattern LSH tables (disjoint sampled dims) —
    shared by lsh_topk and the cross-corpus contamination screen."""
    buckets = F.array(
        *[
            F.struct(
                F.lit(t).alias("tbl"),
                lsh_bucket(
                    vec_col,
                    [
                        (t * bits_per_table + j) % 64
                        for j in range(bits_per_table)
                    ],
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
    c = _lsh_tables(
        _spread(corpus), id_col, vec_col, "neighbor_id",
        num_tables, bits_per_table,
    )
    q = _lsh_tables(
        queries, id_col, vec_col, "query_id", num_tables, bits_per_table
    )
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


def cross_corpus_cosine_pairs(
    train: DataFrame,
    eval_df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.8,
    num_tables: int = 8,
    bits_per_table: int = 4,
) -> DataFrame:
    """SEMANTIC contamination screen across corpora — the
    embedding-space counterpart of the shingle-based
    `dedup.cross_corpus_jaccard_pairs`: flag every (train, eval) pair
    whose cosine clears `threshold`, as a paraphrased or re-rendered
    eval document slips past verbatim n-gram screens but not past its
    embedding. Candidates are pairs colliding in ANY of the
    deterministic sign-pattern LSH tables (so the whole screen is
    SQL-replayable), scored exactly. The train side shuffles once keyed
    by (table, bucket); the eval side — benchmarks are small — is
    broadcast. Never a train×eval cross product."""
    t = _lsh_tables(
        _spread(train), id_col, vec_col, "train_id",
        num_tables, bits_per_table,
    )
    e = _lsh_tables(
        eval_df, id_col, vec_col, "eval_id", num_tables, bits_per_table
    )
    cands = (
        t.join(F.broadcast(e), ["tbl", "bucket"])
        .select("train_id", "eval_id", "__train_id_v", "__eval_id_v")
        .dropDuplicates(["train_id", "eval_id"])
    )
    return (
        cands.withColumn(
            "score", cosine_similarity("__train_id_v", "__eval_id_v")
        )
        .filter(F.col("score") >= threshold)
        .select("train_id", "eval_id", "score")
    )


def cluster_balanced_sample(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_clusters: int = 16,
    cap: int = 100,
    centroids: list[tuple[int, list[float]]] | None = None,
) -> DataFrame:
    """Cluster-BALANCED data selection (the D4/SemDeDup-adjacent
    diversity pass): assign every embedding to its nearest cluster and
    keep at most `cap` docs per cluster, chosen in deterministic hash
    order — over-represented modes thin out, rare modes survive whole.
    Returns (id, cluster_id) for the kept docs.

    The assignment is map-side against literal centroids (no shuffle of
    the corpus); the cap is one window keyed by cluster. The hash order
    makes the kept set identical on every engine and every rerun, and
    — unlike `df.limit` per group — independent of partitioning."""
    cents = (
        centroids
        if centroids is not None
        else seed_centroids(corpus, id_col, vec_col, n_clusters)
    )
    a = ivf_assign(_spread(corpus), cents, id_col, vec_col, n_probe=1).select(
        id_col, F.col("centroid_id").alias("cluster_id")
    )
    w = Window.partitionBy("cluster_id").orderBy(
        F.md5(F.col(id_col).cast("string")), F.col(id_col)
    )
    return (
        a.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= cap)
        .drop("__rn")
    )


def quantize_embeddings(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Symmetric int8 scalar quantization per vector — the standard 4×
    storage shrink for ANN corpora: q_i = round(127 · x_i / max|x|),
    scale = max|x| / 127 (dequantize: q_i · scale). All-zero vectors
    quantize to zeros with scale 0. Pure JVM expressions (`transform`/
    `array_max` — codegen, no UDF); math is done in DOUBLE on every
    engine so the rounding boundary is bit-identical."""
    xd = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    mabs = F.array_max(F.transform(xd, lambda x: F.abs(x)))
    qvec = F.when(
        mabs == 0.0,
        F.transform(xd, lambda x: F.lit(0).cast("tinyint")),
    ).otherwise(
        F.transform(
            xd, lambda x: F.round(x * F.lit(127.0) / mabs).cast("tinyint")
        )
    )
    return df.select(
        F.col(id_col),
        qvec.alias("qvec"),
        (mabs / F.lit(127.0)).alias("scale"),
    )


def semantic_dedup(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    n_centroids: int = 16,
    kmeans_iters: int = 0,
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023 shape):
    cluster embeddings, compare pairs ONLY within a cluster, and drop
    every vector that has a higher-priority (lower-id) neighbor above
    the cosine threshold. Returns the survivors' rows.

    Scale: the IVF cell assignment is map-side against literal
    centroids (no corpus shuffle); the pairwise stage is a self-join
    keyed by centroid_id, so cost is sum(cell²), never O(n²) — the
    cluster count is the knob that bounds the quadratic, exactly the
    SemDeDup argument for clustering before comparing. Deterministic
    end-to-end (portable-hash seeds, lower-id-wins rule): a DuckDB
    oracle replays the whole pipeline. `kmeans_iters` > 0 refines the
    seed cells with Lloyd's iterations (`kmeans_fit`) first — tighter,
    more balanced cells, same downstream pipeline; the default stays 0
    so the SQL oracle can replay the seed path."""
    if kmeans_iters > 0:
        cents, _ = kmeans_fit(
            df, id_col, vec_col, k=n_centroids, iters=kmeans_iters
        )
    else:
        cents = seed_centroids(df, id_col, vec_col, n_centroids)
    a = ivf_assign(_spread(df), cents, id_col, vec_col, n_probe=1).select(
        F.col(id_col).alias("__id"), F.col("__v"), "centroid_id"
    )
    l = a.select(
        F.col("__id").alias("__lid"), F.col("__v").alias("__lv"), "centroid_id"
    )
    r = a.select(
        F.col("__id").alias("__rid"), F.col("__v").alias("__rv"), "centroid_id"
    )
    dropped = (
        l.join(r, "centroid_id")
        .filter(F.col("__lid") < F.col("__rid"))
        .withColumn("__sim", cosine_similarity("__lv", "__rv"))
        .filter(F.col("__sim") >= F.lit(threshold))
        .select(F.col("__rid").alias("__dropped"))
        .distinct()
    )
    return df.join(
        dropped, df[id_col] == dropped["__dropped"], "left_anti"
    )


def _sq_l2_expr(a, b) -> F.Column:
    """Squared L2 distance between two array<double> expressions —
    zip_with + sequential fold (JVM, deterministic float order, no
    Python boundary)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _codebooks_lit(codebooks: list) -> F.Column:
    """The m×codes×sub codebooks as ONE literal nested array. PQ's
    per-row work is then a single higher-order expression LOOPING over
    this value (transform/aggregate) instead of m×codes unrolled fold
    expressions — identical arithmetic, but the plan stays O(1) in
    m×codes, so codegen compiles in milliseconds instead of tens of
    seconds per distinct codebook (measured: 25 s → sub-second plan
    setup at m=16, codes=16)."""
    # built as ONE SQL expression string parsed JVM-side: the
    # Column-builder form (m×codes×sub nested F.lit/F.array calls) is
    # ~4,500 py4j round trips ≈ 1.5 s of driver latency per call —
    # pure fixed overhead on every PQ plan build
    # float literals use repr() (exact round-trip) + the D suffix, the
    # same idiom as ivf_assign — the plan is bit-identical to the
    # composed form
    inner = ",".join(
        "array(" + ",".join(
            "array(" + ",".join(repr(float(x)) + "D" for x in cv) + ")"
            for cv in book
        ) + ")"
        for book in codebooks
    )
    return F.expr(f"array({inner})")


def _pq_subdists(B: F.Column, vec_d, j, sub: int) -> F.Column:
    """array of squared L2 distances from vector-slice j to every code
    of subspace j (j is a 0-based int Column)."""
    sl = F.slice(vec_d, (j * sub + 1).cast("int"), sub)
    return F.transform(
        F.element_at(B, (j + 1).cast("int")), lambda cv: _sq_l2_expr(sl, cv)
    )


def pq_train(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 8,
    codes: int = 16,
    iters: int = 3,
    sample_mod: int | None = None,
) -> list[list[list[float]]]:
    """Product-quantization codebooks (Jégou et al. 2011, the standard
    memory-bounded ANN family; see PAPERS.md): split each vector into
    `m` subspaces and k-means each subspace independently to `codes`
    centroids. Returns codebooks[m][codes][dim/m].

    Scale shape: one `kmeans_fit` run per subspace over SLICED vectors —
    every iteration is map-side assignment against literal centroids
    plus one keyed re-centering shuffle; the driver ever holds only
    m × codes × (dim/m) floats (= dim × codes — a few KB). The
    normalized corpus is persisted for the m×iters jobs (each otherwise
    re-scans the source). `sample_mod=N` trains on the deterministic
    1/N id-hash sample (`xxhash64(id) % N == 0`) — the standard Faiss
    practice: codebooks need a representative sample, not the corpus,
    so training cost is corpus-size-independent at 100 TB.
    Deterministic end-to-end (portable-hash seeding, fixed fold
    order)."""
    from hudi_demo_spark.functions.hashfn import portable_hash60

    first = df.select(vec_col).first()
    if first is None:
        raise ValueError("pq_train: empty corpus")
    dim = len(first[0])
    if dim % m:
        raise ValueError(f"pq_train: dim {dim} not divisible by m={m}")
    sub = dim // m
    if sample_mod and sample_mod > 1:
        df = df.filter(
            F.pmod(F.xxhash64(F.col(id_col)), F.lit(sample_mod)) == 0
        )
    unit = _unit_vectors(df, id_col, vec_col).persist()
    try:
        # seeds: the portable-hash-ordered first `codes` sample vectors
        # (same deterministic pick as seed_centroids), sliced per
        # subspace — every subspace trains on the same seed rows
        seed = sorted(
            unit.select(F.col(id_col).alias("__i"),
                        F.col(vec_col).alias("__v"))
            .orderBy(portable_hash60(F.col("__i").cast("string")), "__i")
            .limit(codes)
            .collect(),
            key=lambda r: r["__i"],
        )
        if len(seed) < codes:
            raise ValueError(
                f"pq_train: corpus/sample has {len(seed)} rows < codes={codes}"
            )
        books = [
            [
                [float(x) for x in r["__v"][j * sub:(j + 1) * sub]]
                for r in seed
            ]
            for j in range(m)
        ]
        # batched Lloyd: ONE job per iteration trains every subspace —
        # each row emits (subspace, nearest-code, subvector) via the same
        # literal-codebook argmin the encoder uses (train and encode
        # share one metric: squared L2 on unit vectors), and recentering
        # is one keyed shuffle on (subspace, code, dimension). The
        # driver collects m×codes×(dim/m) = dim×codes floats per
        # iteration; empty codes keep their previous centroid.
        for _ in range(iters):
            B = _codebooks_lit(books)
            vd = F.transform(F.col(vec_col), lambda x: x.cast("double"))

            def jrow(j):
                d = _pq_subdists(B, vd, j, sub)
                return F.struct(
                    j.cast("int").alias("j"),
                    (F.array_position(d, F.array_min(d)) - 1)
                    .cast("int").alias("c"),
                    F.slice(vd, (j * sub + 1).cast("int"), sub).alias("sv"),
                )

            rows = (
                unit.select(
                    F.explode(
                        F.transform(
                            F.sequence(F.lit(0), F.lit(m - 1)), jrow
                        )
                    ).alias("e")
                )
                .select("e.j", "e.c", F.posexplode("e.sv").alias("d", "x"))
                .groupBy("j", "c", "d")
                .agg(F.avg("x").alias("mu"))
                .collect()
            )
            books = [[list(cv) for cv in book] for book in books]
            for r in rows:
                books[r["j"]][r["c"]][r["d"]] = float(r["mu"])
        return books
    finally:
        unit.unpersist()


def _unit_vectors(df: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    """Project the vector column to unit L2 norm (norm materialized once
    per row, not per element). PQ trains/encodes/scores on UNIT vectors
    so squared-L2 ADC ordering equals cosine ordering (‖a−b‖² = 2−2·cos
    for unit a, b) — the corpus ranking contract of this module is
    cosine. Zero vectors pass through unchanged."""
    nrm = l2_norm(vec_col)
    return df.withColumn("__pqn", nrm).withColumn(
        vec_col,
        F.when(
            F.col("__pqn") > 0,
            F.transform(
                F.col(vec_col), lambda x: x.cast("double") / F.col("__pqn")
            ),
        ).otherwise(
            F.transform(F.col(vec_col), lambda x: x.cast("double"))
        ),
    ).drop("__pqn")


def pq_encode(
    df: DataFrame,
    codebooks: list,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, codes array<int>) — each vector's per-subspace nearest-code
    ids (0-based). Pure map-side expression work: one higher-order loop
    over the literal codebook array (no shuffle, no Python, O(1) plan
    size — see `_codebooks_lit`). Ties break to the LOWER code id
    (`array_position` finds the first minimum) — deterministic."""
    m = len(codebooks)
    sub = len(codebooks[0][0])
    B = _codebooks_lit(codebooks)
    vd = F.transform(F.col(vec_col), lambda x: x.cast("double"))

    def code_j(j):
        d = _pq_subdists(B, vd, j, sub)
        return (F.array_position(d, F.array_min(d)) - 1).cast("int")

    codes_expr = F.transform(
        F.sequence(F.lit(0), F.lit(m - 1)), code_j
    )
    return df.select(F.col(id_col), codes_expr.alias("codes"))


def pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    m: int = 8,
    codes: int = 16,
    iters: int = 3,
    codebooks: list | None = None,
    rerank: int = 4,
) -> DataFrame:
    """Approximate top-k by PQ asymmetric distance (ADC) + exact refine:
    the corpus scan reads m small ints per vector (32× compression at
    dim=64, m=8 — the path that keeps a 100 TB embedding corpus
    scannable), each candidate's distance is m lookups into the query's
    precomputed subspace table, and the k·`rerank` ADC shortlist is
    re-ranked with exact cosine (the production IVFPQ+refine shape —
    full-precision vectors are touched only for the shortlist).

    Vectors are unit-normalized throughout, so squared-L2 ADC ordering
    IS cosine ordering. Scale shape: corpus encodes map-side once
    (codebooks are plan literals); each query carries its m×codes LUT as
    a column; scoring is a broadcast of the tiny query side over the
    encoded corpus — no corpus shuffle except the final top-k window;
    the refine join broadcasts the shortlist. Returns (query_id,
    neighbor_id, score, rank) — cosine, like `brute_force_topk` — or
    (…, adc, rank) ascending when `rerank<=1` (pure ADC)."""
    if codebooks is None:
        codebooks = pq_train(corpus, id_col, vec_col, m, codes, iters)
    m = len(codebooks)
    n_codes = len(codebooks[0])
    sub = len(codebooks[0][0])
    unit_corpus = _unit_vectors(_spread(corpus), id_col, vec_col)
    enc = pq_encode(unit_corpus, codebooks, id_col, vec_col).select(
        F.col(id_col).alias("neighbor_id"), "codes"
    )
    unit_q = _unit_vectors(queries, id_col, vec_col)
    B = _codebooks_lit(codebooks)
    qvd = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    lut = F.flatten(
        F.transform(
            F.sequence(F.lit(0), F.lit(m - 1)),
            lambda j: _pq_subdists(B, qvd, j, sub),
        )
    )
    q = unit_q.select(F.col(id_col).alias("query_id"), lut.alias("__lut"))
    scored = (
        enc.crossJoin(F.broadcast(q))
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "adc",
            F.aggregate(
                F.transform(
                    F.col("codes"),
                    lambda c, i: F.element_at(
                        F.col("__lut"),
                        (i * F.lit(n_codes) + c + F.lit(1)).cast("int"),
                    ),
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("adc").asc(), F.col("neighbor_id").asc()
    )
    shortlist = (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k * max(1, rerank))
        .select("query_id", "neighbor_id", "adc")
    )
    if rerank <= 1:
        w2 = Window.partitionBy("query_id").orderBy(
            F.col("adc").asc(), F.col("neighbor_id").asc()
        )
        return (
            shortlist.withColumn("rank", F.row_number().over(w2))
            .select("query_id", "neighbor_id", "adc", "rank")
        )
    # refine stage (the production IVFPQ+refine shape): exact cosine on
    # the tiny shortlist only — the shortlist broadcasts into an id-keyed
    # join against the corpus, so full-precision vectors are fetched for
    # k·rerank rows per query, never for the whole scan
    cvecs = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cv")
    )
    qvecs = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qv")
    )
    refined = (
        cvecs.join(F.broadcast(shortlist), "neighbor_id")
        .join(F.broadcast(qvecs), "query_id")
        .withColumn("score", cosine_similarity("__qv", "__cv"))
    )
    w3 = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id").asc()
    )
    return (
        refined.withColumn("rank", F.row_number().over(w3))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "score", "rank")
    )


def ivfpq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_centroids: int = 16,
    n_probe: int = 4,
    m: int = 8,
    codes: int = 16,
    iters: int = 3,
    codebooks: list | None = None,
    centroids: list | None = None,
    rerank: int = 4,
    sample_mod: int | None = None,
) -> DataFrame:
    """IVF + PQ composition — the production 100 TB ANN shape (Faiss
    IVFPQ; Jégou et al. 2011): a coarse inverted-file index limits the
    candidate set to the query's `n_probe` probed cells, and inside
    those cells candidates score by PQ asymmetric distance over m small
    ints per vector, with the k·`rerank` shortlist re-ranked at full
    precision. Versus `pq_topk` (flat IndexPQ: ADC over the WHOLE
    encoded corpus per query batch) the scan drops to O(probed cells);
    versus `ivf_topk` (full-precision re-rank inside cells) the
    in-cell scan reads 32×-compressed codes. PQ here quantizes the
    unit vectors directly (not per-cell residuals — residual encoding
    buys recall at the cost of per-cell LUTs; the recall floor in the
    gate guards that this simpler composition stays sufficient).

    Plan shape: corpus → map-side cell assignment + map-side PQ encode
    (centroids and codebooks are plan literals) → ONE shuffle keyed by
    centroid_id for the cell join against the broadcast query side →
    per-query top-k window → broadcast shortlist refine. No crossJoin,
    no corpus-side shuffle besides the cell join and final window."""
    if centroids is None:
        centroids = seed_centroids(corpus, id_col, vec_col, n_centroids)
    if codebooks is None:
        codebooks = pq_train(
            corpus, id_col, vec_col, m, codes, iters, sample_mod=sample_mod
        )
    m = len(codebooks)
    n_codes = len(codebooks[0])
    sub = len(codebooks[0][0])
    unit_corpus = _unit_vectors(_spread(corpus), id_col, vec_col)
    cell = ivf_assign(unit_corpus, centroids, id_col, vec_col, n_probe=1)
    # encode inline over the cell-assigned frame (pq_encode projects
    # (id, codes) and would drop the cell id)
    enc = cell.select(
        F.col(id_col).alias("neighbor_id"),
        F.col("centroid_id"),
        F.col("__v").alias(vec_col),
    )
    B = _codebooks_lit(codebooks)
    vd = F.transform(F.col(vec_col), lambda x: x.cast("double"))

    def code_j(j):
        d = _pq_subdists(B, vd, j, sub)
        return (F.array_position(d, F.array_min(d)) - 1).cast("int")

    enc = enc.select(
        "neighbor_id",
        "centroid_id",
        F.transform(F.sequence(F.lit(0), F.lit(m - 1)), code_j).alias(
            "codes"
        ),
    )
    unit_q = _unit_vectors(queries, id_col, vec_col)
    qcell = ivf_assign(unit_q, centroids, id_col, vec_col, n_probe=n_probe)
    qvd = F.transform(F.col("__v"), lambda x: x.cast("double"))
    lut = F.flatten(
        F.transform(
            F.sequence(F.lit(0), F.lit(m - 1)),
            lambda j: F.transform(
                F.element_at(B, (j + 1).cast("int")),
                lambda cv: _sq_l2_expr(
                    F.slice(qvd, (j * sub + 1).cast("int"), sub), cv
                ),
            ),
        )
    )
    q = qcell.select(
        F.col(id_col).alias("query_id"), "centroid_id", lut.alias("__lut")
    )
    scored = (
        enc.join(F.broadcast(q), "centroid_id")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "adc",
            F.aggregate(
                F.transform(
                    F.col("codes"),
                    lambda c, i: F.element_at(
                        F.col("__lut"),
                        (i * F.lit(n_codes) + c + F.lit(1)).cast("int"),
                    ),
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("adc").asc(), F.col("neighbor_id").asc()
    )
    shortlist = (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k * max(1, rerank))
        .select("query_id", "neighbor_id", "adc")
    )
    if rerank <= 1:
        w2 = Window.partitionBy("query_id").orderBy(
            F.col("adc").asc(), F.col("neighbor_id").asc()
        )
        return (
            shortlist.withColumn("rank", F.row_number().over(w2))
            .select("query_id", "neighbor_id", "adc", "rank")
        )
    cvecs = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cv")
    )
    qvecs = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qv")
    )
    refined = (
        cvecs.join(F.broadcast(shortlist), "neighbor_id")
        .join(F.broadcast(qvecs), "query_id")
        .withColumn("score", cosine_similarity("__qv", "__cv"))
    )
    w3 = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id").asc()
    )
    return (
        refined.withColumn("rank", F.row_number().over(w3))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "score", "rank")
    )


def ivfpq_candidates(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 16,
    n_probe: int = 4,
    centroids: list | None = None,
) -> DataFrame:
    """(query_id, neighbor_id) candidate pairs the IVF stage admits —
    the observable for 'the in-cell scan reads a strict subset of the
    corpus': its count at n_probe < n_centroids is < n_queries ×
    corpus_size, which a plan test asserts."""
    if centroids is None:
        centroids = seed_centroids(corpus, id_col, vec_col, n_centroids)
    unit_corpus = _unit_vectors(_spread(corpus), id_col, vec_col)
    cell = ivf_assign(unit_corpus, centroids, id_col, vec_col, n_probe=1)
    unit_q = _unit_vectors(queries, id_col, vec_col)
    qcell = ivf_assign(unit_q, centroids, id_col, vec_col, n_probe=n_probe)
    return (
        cell.select(F.col(id_col).alias("neighbor_id"), "centroid_id")
        .join(
            F.broadcast(
                qcell.select(F.col(id_col).alias("query_id"), "centroid_id")
            ),
            "centroid_id",
        )
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id")
    )


def kmeans_fit(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 8,
    iters: int = 5,
):
    """Distributed Lloyd's k-means on the IVF plumbing (the "k-means
    iterations on the same plumbing" seed_centroids points at): returns
    (centroids, assignments) where centroids is [(cid, vec)] and
    assignments is (id, centroid_id).

    Scale shape per iteration: the assignment is map-side expression
    work against LITERAL centroids (k × dim floats in the plan — no
    crossJoin, no shuffle of the corpus), and the re-centering is ONE
    keyed shuffle on (cluster, dimension) with map-side partial
    averages. Driver traffic is k × dim floats per iteration. Empty
    clusters keep their previous centroid (deterministic, no
    re-seeding). Seeding is the portable-hash pick, so runs are
    reproducible across engines and cluster sizes."""
    cents = seed_centroids(df, id_col, vec_col, k)
    for _ in range(iters):
        assigned = ivf_assign(df, cents, id_col, vec_col, n_probe=1)
        rows = (
            assigned.select(
                "centroid_id", F.posexplode("__v").alias("__d", "__x")
            )
            .groupBy("centroid_id", "__d")
            .agg(F.avg(F.col("__x").cast("double")).alias("__m"))
            .groupBy("centroid_id")
            .agg(
                F.array_sort(
                    F.collect_list(F.struct("__d", "__m"))
                ).alias("__ms")
            )
            .collect()
        )
        new = {
            r["centroid_id"]: [float(m["__m"]) for m in r["__ms"]]
            for r in rows
        }
        cents = [(cid, new.get(cid, vec)) for cid, vec in cents]
    assigned = ivf_assign(df, cents, id_col, vec_col, n_probe=1).select(
        id_col, "centroid_id"
    )
    return cents, assigned


def hard_negatives(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    k: int = 5,
    anchors: DataFrame | None = None,
    method: str = "exact",
    n_centroids: int = 16,
    n_probe: int = 4,
) -> DataFrame:
    """Hard-negative mining for contrastive training: for every anchor,
    the top-k most-similar vectors whose label DIFFERS — the negatives
    that sit closest to the decision boundary, the standard pair-mining
    step for embedding/reranker training (e.g. DPR/Contriever recipes).
    Returns (anchor_id, negative_id, score, rank); ties break by
    negative id.

    `anchors` defaults to the whole table (every row mines its own
    negatives). method='exact' broadcasts the anchors over one corpus
    scan — right when the anchor set is bounded (a training batch).
    method='ivf' blocks both sides by IVF cell first, so each anchor
    scores only its n_probe/n_centroids slice of the corpus — the scale
    path when anchors ARE the corpus (full-dataset mining), with the
    same recall/probe trade as ivf_topk."""
    if anchors is None:
        anchors = df
    if method == "exact":
        q = anchors.select(
            F.col(id_col).alias("anchor_id"),
            F.col(vec_col).alias("__qv"),
            F.col(label_col).alias("__ql"),
        )
        c = _spread(df).select(
            F.col(id_col).alias("negative_id"),
            F.col(vec_col).alias("__nv"),
            F.col(label_col).alias("__nl"),
        )
        scored = (
            c.crossJoin(F.broadcast(q))
            .filter(
                (F.col("anchor_id") != F.col("negative_id"))
                & (~F.col("__nl").eqNullSafe(F.col("__ql")))
            )
            .withColumn("score", cosine_similarity("__qv", "__nv"))
        )
    elif method == "ivf":
        cents = seed_centroids(df, id_col, vec_col, n_centroids)
        c = ivf_assign(
            _spread(df), cents, id_col, vec_col, n_probe=1,
            extra_cols=[label_col],
        ).select(
            F.col(id_col).alias("negative_id"),
            F.col("__v").alias("__nv"),
            F.col(label_col).alias("__nl"),
            "centroid_id",
        )
        q = ivf_assign(
            anchors, cents, id_col, vec_col, n_probe=n_probe,
            extra_cols=[label_col],
        ).select(
            F.col(id_col).alias("anchor_id"),
            F.col("__v").alias("__qv"),
            F.col(label_col).alias("__ql"),
            "centroid_id",
        )
        scored = (
            c.join(q, "centroid_id")
            .filter(
                (F.col("anchor_id") != F.col("negative_id"))
                & (~F.col("__nl").eqNullSafe(F.col("__ql")))
            )
            .withColumn("score", cosine_similarity("__qv", "__nv"))
        )
    else:
        raise ValueError(f"unknown method {method!r}")
    w = Window.partitionBy("anchor_id").orderBy(
        F.col("score").desc(), F.col("negative_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("anchor_id", "negative_id", "score", "rank")
    )
