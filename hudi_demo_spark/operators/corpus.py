"""Corpus-preparation operators for LLM training-data pipelines:
document chunking, stream packing into fixed-length sequences, test-set
decontamination, repetition (boilerplate) scoring, and PII redaction.

These extend the reference's surface (dongkelun/hudi-demo exercises none
of them — SURVEY.md §2.4 "not present" note) per the BASELINE.json
extension mandate. All are pure built-in-function DataFrame transforms
(whole-stage codegen, no Python UDFs) with exact DuckDB oracle twins in
plans/queries.py.

Scale notes (100 TB):
- chunking / repetition / redaction are narrow per-row transforms — zero
  shuffle, trivially parallel.
- pack_offsets needs a global prefix sum; a naive global-ORDER-BY window
  collapses to ONE partition. We do the classic two-phase scan instead:
  per-bucket cumsum (windows partitioned by a range bucket) + a
  broadcast-joined table of bucket base offsets — every stage stays
  parallel at any scale.
- decontaminate shuffles on the shingle; the test side of the join is
  tiny in practice (benchmarks/eval sets), so it broadcasts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from hudi_demo_spark.functions.textfn import bind, tokens, word_ngrams
from hudi_demo_spark.operators.util import spread as _spread


# ---------------------------------------------------------------------------
# chunking
# ---------------------------------------------------------------------------


def chunk_documents(
    df: DataFrame,
    id_col: str,
    text_col: str,
    chunk_tokens: int = 32,
    stride: int = 24,
) -> DataFrame:
    """Split each document into overlapping token windows:
    (id, chunk_id, chunk_text, chunk_n_tokens).

    Chunk i covers tokens [i*stride, i*stride + chunk_tokens); chunks are
    emitted while their start is inside the document, so every token is
    covered and short docs yield exactly one chunk. Pure array ops — the
    explode multiplies rows but never shuffles."""
    assert 0 < stride <= chunk_tokens

    def build(toks):
        n = F.size(toks)
        n_chunks = F.greatest(
            F.ceil((n - F.lit(chunk_tokens)) / F.lit(stride)) + 1, F.lit(1)
        )
        return F.transform(
            F.sequence(F.lit(0), n_chunks.cast("int") - 1),
            lambda i: F.struct(
                i.alias("chunk_id"),
                F.concat_ws(" ", F.slice(toks, i * stride + 1, chunk_tokens)).alias(
                    "chunk_text"
                ),
                F.least(n - i * stride, F.lit(chunk_tokens)).alias("chunk_n_tokens"),
            ),
        )

    # tokenization bound once per row (textfn.bind) — referencing the
    # token subtree inside the lambda would re-split the text per chunk
    chunks = bind(tokens(text_col), build)
    return (
        _spread(df)
        .select(F.col(id_col), F.explode(chunks).alias("c"))
        .select(
            id_col,
            F.col("c.chunk_id").cast("long").alias("chunk_id"),
            F.col("c.chunk_text").alias("chunk_text"),
            F.col("c.chunk_n_tokens").cast("long").alias("chunk_n_tokens"),
        )
    )


# ---------------------------------------------------------------------------
# stream packing
# ---------------------------------------------------------------------------


def pack_offsets(
    df: DataFrame,
    id_col: str,
    text_col: str,
    seq_len: int = 64,
    n_buckets: int = 32,
) -> DataFrame:
    """GPT-style stream packing: documents are concatenated in `id` order
    into one token stream (one EOS token between docs) and the stream is
    cut into fixed `seq_len` sequences. Returns per-document placement:
    (id, n_tokens, start_token, first_seq, last_seq).

    The global prefix sum is computed scalably: docs are range-bucketed
    on id, cumsum'd per bucket (parallel windows), and bucket base
    offsets — n_buckets rows — are prefix-summed and broadcast back.
    No single-partition window at any stage."""
    base = df.select(
        F.col(id_col),
        (F.size(tokens(text_col)) + F.lit(1)).cast("long").alias("__len"),  # +1 EOS
    )
    lo_hi = base.agg(F.min(id_col).alias("lo"), F.max(id_col).alias("hi")).collect()[0]
    width = max(1, (int(lo_hi["hi"]) - int(lo_hi["lo"]) + n_buckets) // n_buckets)
    bucketed = base.withColumn(
        "__b", ((F.col(id_col) - F.lit(int(lo_hi["lo"]))) / width).cast("int")
    )
    w = Window.partitionBy("__b").orderBy(id_col)
    local = bucketed.withColumn(
        "__cum", F.sum("__len").over(w) - F.col("__len")
    )
    bucket_tot = (
        bucketed.groupBy("__b").agg(F.sum("__len").alias("__tot"))
    )
    wb = Window.orderBy("__b")  # n_buckets rows only — single partition is fine
    bucket_base = bucket_tot.withColumn(
        "__base", F.sum("__tot").over(wb) - F.col("__tot")
    ).select("__b", "__base")
    start = F.col("__cum") + F.col("__base")
    end = start + F.col("__len") - 1  # inclusive last token (EOS)
    return (
        local.join(F.broadcast(bucket_base), "__b")
        .select(
            F.col(id_col),
            (F.col("__len") - 1).alias("n_tokens"),
            start.alias("start_token"),
            F.floor(start / seq_len).alias("first_seq"),
            F.floor(end / seq_len).alias("last_seq"),
        )
    )


def length_batches(
    df: DataFrame,
    id_col: str,
    text_col: str,
    boundaries: tuple = (64, 256, 1024),
    batch_size: int = 32,
    n_sub: int = 256,
) -> DataFrame:
    """Sequence-bucketed batch plan (the padding-efficiency batching
    step): assign each document a length bucket (token count vs
    `boundaries`) and a deterministic batch index within its bucket —
    (id, n_tokens, bucket, batch_idx). Batch order is portable-hash of
    the id (stable shuffle within a bucket), so the plan is reproducible
    on any engine and any parallelism.

    Scale: positions within a bucket need a bucket-global row number; a
    window partitioned by the handful of length buckets would collapse
    each bucket to ONE task. Instead the pack_offsets two-phase shape:
    hash-subbucket windows (parallel) + a (buckets × n_sub)-row base-
    offset table broadcast back — every stage stays parallel at any
    corpus size."""
    from hudi_demo_spark.functions.hashfn import portable_hash60

    n = F.size(tokens(text_col)).cast("long")
    bucket = F.lit(len(boundaries))
    for i in reversed(range(len(boundaries))):
        bucket = F.when(n <= F.lit(boundaries[i]), F.lit(i)).otherwise(bucket)
    h = portable_hash60(F.col(id_col).cast("string"))
    # sub-bucket = TOP bits of the hash: a PREFIX of the sort key, so
    # (sub asc, h asc) ordering equals global h ordering — positions
    # composed from per-sub windows match a bucket-global row number
    base = df.select(
        F.col(id_col), n.alias("__n"), bucket.alias("bucket"),
        h.alias("__h"),
        F.floor(h / F.lit(2 ** 60 // n_sub)).cast("int").alias("__s"),
    )
    w = Window.partitionBy("bucket", "__s").orderBy("__h", id_col)
    local = base.withColumn("__rn", F.row_number().over(w))
    counts = base.groupBy("bucket", "__s").agg(F.count("*").alias("__c"))
    # (buckets × n_sub) rows only — single-partition window is fine
    wb = Window.partitionBy("bucket").orderBy("__s")
    offs = counts.withColumn(
        "__base", F.sum("__c").over(wb) - F.col("__c")
    ).select("bucket", "__s", "__base")
    pos = F.col("__base") + F.col("__rn") - 1
    return local.join(F.broadcast(offs), ["bucket", "__s"]).select(
        F.col(id_col),
        F.col("__n").alias("n_tokens"),
        "bucket",
        F.floor(pos / batch_size).cast("long").alias("batch_idx"),
    )


# ---------------------------------------------------------------------------
# decontamination
# ---------------------------------------------------------------------------


def decontaminate(
    train: DataFrame,
    test: DataFrame,
    id_col: str,
    text_col: str,
    ngram: int = 8,
) -> DataFrame:
    """Remove training documents that share any word n-gram with the test
    set (the standard eval-contamination filter). Returns the surviving
    train rows.

    Shingle both sides, left_anti join train shingles against test
    shingles, keep docs with no hit. The test side is distinct'd and
    broadcast (eval sets are small); train shingles stream through
    map-side — no shuffle of the 100-TB side."""
    tr = _spread(train).select(
        F.col(id_col), F.explode(word_ngrams(text_col, ngram)).alias("__g")
    )
    te = test.select(F.explode(word_ngrams(text_col, ngram)).alias("__g")).distinct()
    dirty = tr.join(F.broadcast(te), "__g", "left_semi").select(id_col).distinct()
    return train.join(dirty, id_col, "left_anti")


def dedup_lines(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_occurrences: int = 2,
) -> DataFrame:
    """Corpus-level LINE deduplication (the CCNet/RefinedWeb boilerplate
    pass: cookie banners, nav menus, copyright footers appear in
    thousands of documents — drop every line whose corpus-wide
    occurrence count exceeds `max_occurrences`, keep document line order
    otherwise). Returns (id, text) with offending lines removed; a
    document whose every line is boilerplate survives with empty text.

    Scale: explode to (doc, line-index, line), ONE corpus-wide line
    count (map-side combinable; hot boilerplate lines are exactly the
    skew AQE's skew-join handles), semi-join back, and per-doc
    reassembly via sort_array(collect_list) — keyed shuffles only,
    nothing corpus-global."""
    lines = _spread(df).select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("__i", "__l"),
    )
    freq = lines.groupBy("__l").agg(F.count("*").alias("__c"))
    kept = lines.join(
        freq.filter(F.col("__c") <= max_occurrences), "__l", "left_semi"
    )
    rebuilt = kept.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("__i", "__l"))),
                lambda s: s["__l"],
            ),
            "\n",
        ).alias(text_col)
    )
    # docs whose every line was boilerplate still exist (empty text)
    return df.select(id_col).join(rebuilt, id_col, "left").select(
        F.col(id_col),
        F.coalesce(F.col(text_col), F.lit("")).alias(text_col),
    )


def contamination_report(
    train: DataFrame,
    test: DataFrame,
    id_col: str,
    text_col: str,
    ngram: int = 8,
) -> DataFrame:
    """(id, n_shingles, n_contaminated, contamination_frac) per training
    document — the AUDIT form of `decontaminate`: instead of silently
    dropping any-hit docs, report how much of each document's n-gram
    mass overlaps the eval set, so thresholds can be chosen on evidence
    (the common operational step before committing to a filter).

    Same scale shape as decontaminate: eval shingles distinct'd and
    broadcast, train side streams map-side; the only shuffle is the
    per-doc count aggregate."""
    tr = _spread(train).select(
        F.col(id_col),
        F.explode(word_ngrams(text_col, ngram)).alias("__g"),
    )
    te = (
        test.select(F.explode(word_ngrams(text_col, ngram)).alias("__g"))
        .distinct()
        .withColumn("__hit", F.lit(1))
    )
    joined = tr.join(F.broadcast(te), "__g", "left")
    return joined.groupBy(id_col).agg(
        F.count("*").cast("long").alias("n_shingles"),
        F.coalesce(F.sum("__hit"), F.lit(0)).cast("long").alias(
            "n_contaminated"
        ),
        F.round(
            F.coalesce(F.sum("__hit"), F.lit(0)) / F.count("*"), 4
        ).alias("contamination_frac"),
    )


# ---------------------------------------------------------------------------
# repetition / boilerplate
# ---------------------------------------------------------------------------


def repetition_score(
    df: DataFrame, id_col: str, text_col: str, ngram: int = 3
) -> DataFrame:
    """(id, n_grams, n_distinct_grams, dup_ratio): fraction of repeated
    word n-grams — the cheap boilerplate/template detector. Per-row array
    math only; no shuffle, no explode."""
    stats = bind(
        word_ngrams(text_col, ngram),
        lambda grams: F.struct(
            F.size(grams).alias("n"), F.size(F.array_distinct(grams)).alias("nd")
        ),
    )
    n, nd = F.col("__s.n"), F.col("__s.nd")
    return (
        df.withColumn("__s", stats)
        .select(
            F.col(id_col),
            n.cast("long").alias("n_grams"),
            nd.cast("long").alias("n_distinct_grams"),
            F.round(
                F.when(n > 0, (n - nd) / n).otherwise(F.lit(0.0)), 4
            ).alias("dup_ratio"),
        )
    )


# ---------------------------------------------------------------------------
# PII redaction
# ---------------------------------------------------------------------------

# dialect-portable patterns (valid and equivalent in Java regex and RE2):
PII_PATTERNS = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ip": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
    "phone": r"\+\d{1,3}[- ]\d{3}[- ]\d{3,4}[- ]\d{3,4}",
}


def redact_pii(df: DataFrame, text_col: str, out_col: str | None = None) -> DataFrame:
    """Replace emails, IPv4 addresses and international phone numbers
    with [EMAIL]/[IP]/[PHONE] placeholders. Order matters: emails first
    (so user@host never half-matches), then IPs, then phones."""
    c = F.col(text_col)
    c = F.regexp_replace(c, PII_PATTERNS["email"], "[EMAIL]")
    c = F.regexp_replace(c, PII_PATTERNS["ip"], "[IP]")
    c = F.regexp_replace(c, PII_PATTERNS["phone"], "[PHONE]")
    return df.withColumn(out_col or text_col, c)


def cap_per_group(
    df: DataFrame,
    group_col: str,
    id_col: str,
    max_per_group: int,
) -> DataFrame:
    """Per-group document cap (the C4/RefinedWeb "max pages per domain"
    rule, generalized to any group: domain, source, author): keep at
    most `max_per_group` rows per group, chosen DETERMINISTICALLY by
    portable-hash order (id as tiebreak) so the kept set is stable
    across runs, engines, and data growth-reshuffles.

    One keyed window (group-partitioned — parallel across groups, never
    a global sort); a hot group bounds a single partition's work at
    O(group size), the same skew profile as any per-key aggregate."""
    from hudi_demo_spark.functions.hashfn import portable_hash60

    w = Window.partitionBy(group_col).orderBy(
        portable_hash60(F.col(id_col).cast("string")), F.col(id_col)
    )
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= max_per_group)
        .drop("__rn")
    )


def retention_filter(
    df: DataFrame,
    score_col: str,
    retention: float,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Quality-threshold CALIBRATION: keep the top `retention` fraction
    of rows by `score_col`, per group — the standard way a pipeline
    turns a quality signal (classifier margin, Gopher score, logprob)
    into a filter without hand-picking a cutoff ("keep the best 40% of
    every domain"). The cutoff is the exact interpolated quantile at
    q = 1 - retention, so ties at the boundary are kept (retention is
    a floor, never undershot).

    With `group_cols`, one keyed shuffle computes each group's cutoff
    via a window aggregate — per-domain calibration at corpus scale.
    Without groups the window is global (single-partition reduce over
    scores only): fine to ~10^8 rows; past that use
    `profile_numeric(approx=True)`'s quantile sketch and filter by the
    approximate cutoff instead."""
    if not 0.0 < retention <= 1.0:
        raise ValueError("retention must be in (0, 1]")
    w = (
        Window.partitionBy(*group_cols)
        if group_cols
        else Window.partitionBy()
    )
    cutoff = F.percentile(F.col(score_col), F.lit(1.0 - retention)).over(w)
    return (
        df.withColumn("__cut", cutoff)
        .filter(F.col(score_col) >= F.col("__cut"))
        .drop("__cut")
    )


def dsir_weights(
    df: DataFrame,
    id_col: str,
    text_col: str,
    target_cond: str,
    n_buckets: int = 256,
    alpha: float = 0.5,
) -> DataFrame:
    """DSIR-style importance weights (Xie et al. 2023, "Data Selection
    for Language Models via Importance Resampling", hashed n-gram
    variant): score every raw document by how target-like its hashed
    unigram+bigram feature distribution is —
    ``log w(d) = Σ_f log p_target(b(f)) / p_raw(b(f))`` with add-alpha
    smoothing over `n_buckets` hashed buckets. Sampling ∝ w is the
    standard pre-training data-selection step for steering a crawl
    toward a target domain.

    Scale shape: fit/score is inherently TWO corpus passes. Fit: one
    explode + map-side-combinable bucket aggregate whose B result rows
    are the only driver state. Score: one explode + keyed per-doc agg,
    with the B-entry log-ratio table riding in-plan as a literal array
    (no join, no broadcast build). Features hash with the
    engine-portable md5 so a SQL oracle replays bucket-for-bucket;
    corpus shuffles only (doc, bucket) pairs.

    Returns (id, n_features, log_weight) — log_weight rounded to 3
    decimals (sum of ≤B per-doc terms; both engines agree at that
    precision)."""
    from hudi_demo_spark.functions.hashfn import portable_hash60

    toks = tokens(F.lower(F.col(text_col)))
    base = df.select(
        F.col(id_col),
        F.expr(target_cond).cast("boolean").alias("__is_t"),
        toks.alias("__t"),
    )
    feats = base.select(
        id_col,
        "__is_t",
        F.explode(
            F.concat(
                F.col("__t"),
                # greatest(…, 0): an empty/whitespace-only doc has zero
                # tokens — a raw size-1 slice length would be negative
                # and abort the whole job (oracle's range(1,0) is empty)
                F.expr(
                    "transform(slice(__t, 1, greatest(size(__t) - 1, 0)), "
                    "(x, i) -> x || ' ' || element_at(__t, i + 2))"
                ),
            )
        ).alias("__f"),
    ).withColumn(
        "__b", F.pmod(portable_hash60("__f"), F.lit(n_buckets))
    )
    # FIT pass: per-bucket counts (map-side-combinable agg, B result
    # rows collected — the only driver state). The fit/score split is
    # inherently two corpus passes; neither caches anything.
    import math

    rows = (
        feats.groupBy("__b")
        .agg(
            F.sum(F.col("__is_t").cast("long")).alias("nt"),
            F.count("*").alias("nr"),
        )
        .collect()
    )
    tt = sum(r["nt"] for r in rows)
    tr = sum(r["nr"] for r in rows)
    lr = [0.0] * n_buckets  # empty buckets are never referenced
    for r in rows:
        lr[r["__b"]] = math.log(
            (r["nt"] + alpha) / (tt + alpha * n_buckets)
        ) - math.log((r["nr"] + alpha) / (tr + alpha * n_buckets))
    # SCORE pass: ratio table rides IN-PLAN as a literal array (the
    # SemDeDup literal-centroid trick) — no join, no broadcast build,
    # one keyed aggregate per doc
    ratio = F.element_at(
        F.array(*[F.lit(v) for v in lr]),
        (F.col("__b") + 1).cast("int"),
    )
    return (
        feats.groupBy(id_col, "__b")
        .agg(F.count("*").alias("__c"))
        .groupBy(id_col)
        .agg(
            F.sum("__c").alias("n_features"),
            F.round(F.sum(F.col("__c") * ratio), 3).alias("log_weight"),
        )
    )


def dsir_resample(
    df: DataFrame,
    id_col: str,
    text_col: str,
    target_cond: str,
    k: int,
    n_buckets: int = 256,
    alpha: float = 0.5,
    seed: str = "dsir",
) -> DataFrame:
    """The RESAMPLING step of DSIR: draw `k` docs without replacement
    with probability ∝ exp(log_weight), via the Gumbel-top-k trick —
    score = log_weight + Gumbel(0,1), take the k largest. The Gumbel
    noise derives from the engine-portable md5 hash of (seed, id), so
    the draw is deterministic, reproducible across engines, and
    SQL-oracle-checkable; changing `seed` redraws.

    Scale shape: one pass to score (dsir_weights) + a TakeOrdered
    top-k — no global sort materializes."""
    w = dsir_weights(df, id_col, text_col, target_cond,
                     n_buckets=n_buckets, alpha=alpha)
    from hudi_demo_spark.functions.hashfn import portable_hash60

    m = 1 << 53
    h = portable_hash60(
        F.concat(F.lit(seed + ":"), F.col(id_col).cast("string"))
    )
    u = (F.pmod(h, F.lit(m)) + 0.5) / F.lit(float(m))
    score = F.col("log_weight") - F.log(-F.log(u))
    return (
        w.select(id_col, "log_weight", F.round(score, 3).alias("score"))
        .orderBy(F.col("score").desc(), F.col(id_col).asc())
        .limit(k)
    )
