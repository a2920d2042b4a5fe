"""Text-analysis operators: token counting, quality scoring, language ID,
fingerprinting — the standard pre-training corpus filters.

Pure built-in-function DataFrame transforms (codegen'd); each has an
ANSI-SQL oracle twin in __spark_entry__."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hudi_demo_spark.operators.util import spread as _spread

from hudi_demo_spark.functions.textfn import (
    bind,
    bpe_tokens,
    fingerprint_md5,
    punct_ratio,
    tokens,
    upper_ratio,
)

# tiny per-language stopword lists (public, standard closed-class words);
# enough signal for an n-gram-free heuristic language ID on latin scripts,
# with a CJK-codepoint check for zh.
STOPWORDS = {
    "en": ["the", "and", "of", "to", "is", "a"],
    "de": ["der", "die", "und", "das", "ist", "ein"],
    "fr": ["le", "la", "et", "les", "des", "est"],
    "es": ["el", "la", "los", "las", "es", "una"],
}


def token_stats(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, n_tokens, n_bpe_tokens, n_chars_seen, avg_token_len).

    The token array is bound once per row (textfn.bind) — its three
    references would otherwise re-split the text each time."""
    stats = bind(
        tokens(text_col),
        lambda toks: F.struct(
            F.size(toks).alias("n"),
            F.aggregate(toks, F.lit(0.0), lambda acc, t: acc + F.length(t)).alias(
                "chars"
            ),
        ),
    )
    return (
        df.withColumn("__s", stats)
        .select(
            F.col(id_col),
            F.col("__s.n").alias("n_tokens"),
            F.size(bpe_tokens(text_col)).alias("n_bpe_tokens"),
            F.length(F.col(text_col)).alias("n_chars_seen"),
            F.round(
                F.col("__s.chars") / F.greatest(F.col("__s.n"), F.lit(1)), 4
            ).alias("avg_token_len"),
        )
    )


def quality_score(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Heuristic quality features + a composite score in [0, 1]:
    penalize very short docs, high punctuation, high uppercase."""
    feats = F.struct(
        F.size(tokens(text_col)).alias("n_tok"),
        punct_ratio(text_col).alias("pr"),
        upper_ratio(text_col).alias("ur"),
    )
    n_tok, pr, ur = F.col("__f.n_tok"), F.col("__f.pr"), F.col("__f.ur")
    len_score = F.least(n_tok / F.lit(20.0), F.lit(1.0))
    score = len_score * (1 - F.least(pr * 5, F.lit(1.0))) * (1 - F.least(ur * 5, F.lit(1.0)))
    # one projection computes each regex/split feature once; the score
    # then reads cheap struct fields instead of re-running the regexes
    return df.withColumn("__f", feats).select(
        F.col(id_col),
        n_tok.alias("n_tokens"),
        F.round(pr, 4).alias("punct_ratio"),
        F.round(ur, 4).alias("upper_ratio"),
        F.round(score, 4).alias("quality_score"),
    )


def _count_words(text_col: str, words: list[str]) -> F.Column:
    pat = r"\b(" + "|".join(words) + r")\b"
    return F.size(F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(pat), 0))


LANG_ORDER = ["en", "de", "fr", "es"]  # clause order = tie-break preference


def language_id(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, pred_lang): stopword-hit argmax over {en,de,fr,es}, 'zh' when
    CJK codepoints appear, 'und' when nothing matches. Explicit CASE
    chain (first language in LANG_ORDER wins ties) so the SQL oracle can
    mirror it verbatim."""
    feats = F.struct(
        *[_count_words(text_col, STOPWORDS[lang]).alias(lang) for lang in LANG_ORDER],
        (
            F.length(F.col(text_col))
            - F.length(F.regexp_replace(F.col(text_col), r"[一-鿿]", ""))
        ).alias("cjk"),
    )
    # one projection runs each stopword regex once; the CASE chain below
    # references the counts many times (argmax comparisons) and would
    # otherwise re-run every regexp_extract_all per reference
    hits = {lang: F.col(f"__f.{lang}") for lang in LANG_ORDER}
    pred = F.when(F.col("__f.cjk") > 0, F.lit("zh"))
    for i, lang in enumerate(LANG_ORDER):
        cond = hits[lang] > 0
        for other in LANG_ORDER[i + 1 :]:
            cond = cond & (hits[lang] >= hits[other])
        pred = pred.when(cond, F.lit(lang))
    pred = pred.otherwise(F.lit("und"))
    return df.withColumn("__f", feats).select(F.col(id_col), pred.alias("pred_lang"))


def fingerprints(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, fingerprint): md5 of the normalized text (see
    functions.textfn.fingerprint_md5); rolling-hash/simhash variants in
    operators.dedup."""
    return df.select(F.col(id_col), fingerprint_md5(text_col).alias("fingerprint"))


def winnow_fingerprints(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 3,
    w: int = 4,
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer, Wilkerson & Aiken
    2003 — the MOSS algorithm): hash every token k-gram, slide a window
    of `w` consecutive hashes, select each window's MINIMUM (rightmost
    position on ties), deduplicate selections. The winnowing guarantee:
    any verbatim match of at least w+k-1 tokens between two documents
    shares at least one selected fingerprint, while only ~2/(w+1) of
    all k-gram hashes are kept — the local fingerprinting that makes
    plagiarism/near-copy detection index-able at corpus scale (join
    documents on `fp` instead of comparing texts).

    Returns (id, pos, fp) — pos is the selected k-gram's token offset.
    Plan shape: ENTIRELY map-side — the sliding min runs inside each
    document's gram ARRAY (`array_min` over struct slices, smallest
    hash / rightmost position on ties, per-doc `array_distinct`), so
    selection needs no shuffle, no window sort and no global distinct;
    a document never leaves its input partition. (The previous
    posexplode + keyed-window formulation funneled every gram row
    through one shuffle whose tiny byte size AQE-coalesced to a single
    task — a serialization point that only gets worse with corpus
    size.) Hashes are portable md5-60, so a SQL oracle replays
    selection bit-for-bit."""
    from hudi_demo_spark.functions.hashfn import portable_hash60

    toks = F.filter(
        F.split(F.lower(F.col(text_col)), r"\W+"), lambda x: x != ""
    )
    # (fp, np=-pos) structs: struct ordering makes min() = smallest
    # hash, then most-negative np = RIGHTMOST position — the winnowing
    # tiebreak
    arr_expr = F.when(
        F.size(toks) >= k,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - k),
            lambda i: F.struct(
                portable_hash60(
                    F.concat_ws(" ", F.slice(toks, i + 1, k))
                ).alias("fp"),
                (-i).alias("np"),
            ),
        ),
    ).otherwise(
        F.array().cast("array<struct<fp:bigint,np:int>>")
    )
    # materialize the hashed gram array behind a projection boundary:
    # the selection below references it ~n·w times, and inlining would
    # re-run the md5 transform per reference (no CSE across lambda
    # scopes — measured catastrophic). CollapseProject keeps the
    # boundary because the expression is non-cheap and multiply-used.
    hashed = _spread(df).select(F.col(id_col), arr_expr.alias("__arr"))
    arr = F.col("__arr")
    n = F.size(arr)
    # full windows: positions w-1..n-1 select min over the w grams
    # ending there; short documents (0 < n < w) keep the tail guard —
    # one selection, the min over all of their grams
    sels = F.when(
        n >= w,
        F.transform(
            F.sequence(F.lit(w - 1), n - 1),
            lambda p: F.array_min(F.slice(arr, p - (w - 2), w)),
        ),
    ).when(
        n > 0, F.array(F.array_min(arr))
    ).otherwise(F.array().cast("array<struct<fp:bigint,np:int>>"))
    return hashed.select(
        F.col(id_col), F.explode(F.array_distinct(sels)).alias("s")
    ).select(
        id_col,
        (-F.col("s.np")).cast("int").alias("pos"),
        F.col("s.fp").alias("fp"),
    )


def term_frequencies(
    df: DataFrame, text_col: str, min_freq: int = 1
) -> DataFrame:
    """(term, freq) corpus vocabulary — tokenizer/BPE prep. One explode
    + one keyed count (map-side combinable); `min_freq` prunes the
    hapax tail before it reaches the driver or any sink."""
    terms = df.select(
        F.explode(
            F.filter(F.split(F.lower(F.col(text_col)), r"\W+"), lambda x: x != "")
        ).alias("term")
    )
    out = terms.groupBy("term").agg(F.count("*").alias("freq"))
    if min_freq > 1:
        out = out.filter(F.col("freq") >= min_freq)
    return out


def unigram_logprob(
    df: DataFrame, id_col: str, text_col: str, round_to: int = 4
) -> DataFrame:
    """(id, n_tokens, avg_logprob): mean log10 probability of each
    document's tokens under the corpus unigram distribution — the
    cheap perplexity-style quality signal (template junk scores high,
    rare-token noise scores low).

    Two keyed shuffles: the corpus term-count aggregate (map-side
    combinable) and the per-doc average; the unigram table joins back
    broadcast (vocabulary-sized at any corpus scale)."""
    terms = _spread(df).select(
        F.col(id_col), F.explode(tokens(text_col)).alias("__t")
    )
    total = terms.count()  # one scalar; needed as an exact constant
    uni = terms.groupBy("__t").agg(F.count("*").alias("__f"))
    scored = terms.join(F.broadcast(uni), "__t").groupBy(id_col).agg(
        F.count("*").cast("long").alias("n_tokens"),
        F.round(
            F.avg(F.log10(F.col("__f") / F.lit(float(total)))), round_to
        ).alias("avg_logprob"),
    )
    return scored


def bigram_logprob(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: float = 1.0,
    round_to: int = 4,
) -> DataFrame:
    """(id, n_bigrams, avg_logprob): mean log10 add-k-smoothed bigram
    probability of each document under the corpus LM — the CCNet-style
    perplexity quality filter one order up from `unigram_logprob`
    (repetitive template junk scores high, incoherent token soup scores
    low even when its unigrams are common). P(w2|w1) =
    (c(w1,w2) + k) / (c(w1) + k·V), c(w1) the corpus unigram count and
    V the vocabulary size. Docs with fewer than two tokens drop out
    (they have no bigram evidence).

    Scale shape: bigram extraction is a codegen zip_with projection
    (no Python); the corpus bigram table aggregates map-side and joins
    back by (w1, w2) hash — vocabulary-squared bounded, so it shuffles,
    it does not broadcast; the unigram table and the (V, total) scalar
    ride broadcast."""
    bg = (
        "zip_with(slice(__tk, 1, greatest(size(__tk) - 1, 0)), "
        "slice(__tk, 2, greatest(size(__tk) - 1, 0)), "
        "(a, b) -> struct(a AS w1, b AS w2))"
    )
    pairs = (
        _spread(df)
        .select(F.col(id_col), tokens(text_col).alias("__tk"))
        .select(id_col, F.explode(F.expr(bg)).alias("__bg"))
        .select(
            id_col,
            F.col("__bg.w1").alias("__w1"),
            F.col("__bg.w2").alias("__w2"),
        )
    )
    toks = _spread(df).select(F.explode(tokens(text_col)).alias("__w1"))
    uni = toks.groupBy("__w1").agg(F.count("*").alias("__c1"))
    vocab = uni.agg(F.count("*").alias("__v"))
    big = pairs.groupBy("__w1", "__w2").agg(F.count("*").alias("__c2"))
    logp = F.log10(
        (F.col("__c2") + F.lit(k))
        / (F.col("__c1") + F.lit(k) * F.col("__v"))
    )
    return (
        pairs.join(big, ["__w1", "__w2"])
        .join(F.broadcast(uni), "__w1")
        .crossJoin(F.broadcast(vocab))
        .groupBy(id_col)
        .agg(
            F.count("*").cast("long").alias("n_bigrams"),
            F.round(F.avg(logp), round_to).alias("avg_logprob"),
        )
    )


def _bm25_parts(df, id_col, text_col, k1, b):
    """Shared BM25 plumbing: (base, stats, terms-exploder, idf, denom,
    score columns) — `base` carries (id, __dl, __tk), `stats` is the
    one-row (N, avgdl) broadcast, and the returned expressions assume
    the caller built the per-(doc, term) tf table with columns
    __tf/__df/__dl joined to stats."""
    base = _spread(df).select(
        F.col(id_col), F.size(tokens(text_col)).alias("__dl"),
        tokens(text_col).alias("__tk"),
    )
    stats = base.agg(
        F.count("*").alias("__n_docs"), F.avg("__dl").alias("__avgdl")
    )
    idf = F.log(
        (F.col("__n_docs") - F.col("__df") + F.lit(0.5))
        / (F.col("__df") + F.lit(0.5))
        + F.lit(1.0)
    )
    denom = F.col("__tf") + F.lit(k1) * (
        F.lit(1.0 - b) + F.lit(b) * F.col("__dl") / F.col("__avgdl")
    )
    score = idf * F.col("__tf") * F.lit(k1 + 1.0) / denom
    return base, stats, score


def bm25_score(
    df: DataFrame,
    id_col: str,
    text_col: str,
    query_terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
    round_to: int = 4,
) -> DataFrame:
    """(id, n_tokens, bm25): Okapi BM25 relevance of every document to a
    small query-term set (Lucene's idf variant,
    ln((N - df + 0.5)/(df + 0.5) + 1)) — the retrieval-style signal a
    curation pipeline uses to up-weight docs relevant to a target
    domain. Docs with no query term score 0.0.

    Query terms are matched VERBATIM against whitespace tokens (the
    same policy as `bm25_topk` and the SQL oracle); pre-fold case on
    both the text column and the query list if case-insensitive
    retrieval is wanted.

    Scale shape: the `isin(query)` filter is a map-side prune, so the
    only per-token shuffle is the per-(doc, matched-term) tf count —
    O(docs × |query|) rows, not O(tokens). Corpus stats (N, avgdl) are
    one scalar row cross-joined broadcast; the df(term) table is
    |query|-sized and broadcast. Everything stays in codegen."""
    q = sorted(set(query_terms))
    if not q:
        raise ValueError("bm25_score needs at least one query term")
    base, stats, score = _bm25_parts(df, id_col, text_col, k1, b)
    terms = base.select(
        id_col, "__dl", F.explode("__tk").alias("__t")
    ).filter(F.col("__t").isin(q))
    tf = terms.groupBy(id_col, "__dl", "__t").agg(
        F.count("*").alias("__tf")
    )
    dfreq = tf.groupBy("__t").agg(F.count("*").alias("__df"))
    scored = (
        tf.join(F.broadcast(dfreq), "__t")
        .crossJoin(F.broadcast(stats))
        .withColumn("__s", score)
        .groupBy(id_col)
        .agg(F.round(F.sum("__s"), round_to).alias("bm25"))
    )
    return (
        base.select(id_col, F.col("__dl").cast("long").alias("n_tokens"))
        .join(scored, id_col, "left")
        .fillna({"bm25": 0.0})
    )


def bm25_topk(
    df: DataFrame,
    queries: DataFrame,
    id_col: str,
    text_col: str,
    query_id_col: str,
    query_terms_col: str,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    round_to: int = 4,
) -> DataFrame:
    """(query_id, doc_id, bm25, rank): top-k BM25 retrieval for a whole
    TABLE of queries (query_id, array<string> terms) — the batch search
    join a curation pipeline runs to mine target-domain documents for
    many topics at once. Ties broken by doc id for determinism.

    Scale shape: the query set is the small side — its exploded
    (query_id, term) pairs broadcast into the per-(doc, term) tf table,
    which is pre-pruned map-side to terms any query mentions
    (broadcast semi-join, so the corpus tokens shuffle only
    O(docs × matched terms) rows). Scores aggregate per
    (query_id, doc), and top-k is one window partitioned by query —
    parallel across queries. Corpus stats travel as one broadcast row."""
    qterms = queries.select(
        F.col(query_id_col).alias("__qid"),
        F.explode(query_terms_col).alias("__t"),
    ).distinct()
    base, stats, score = _bm25_parts(df, id_col, text_col, k1, b)
    terms = base.select(
        id_col, "__dl", F.explode("__tk").alias("__t")
    ).join(F.broadcast(qterms.select("__t").distinct()), "__t", "left_semi")
    tf = terms.groupBy(id_col, "__dl", "__t").agg(
        F.count("*").alias("__tf")
    )
    dfreq = tf.groupBy("__t").agg(F.count("*").alias("__df"))
    scored = (
        tf.join(F.broadcast(dfreq), "__t")
        .join(F.broadcast(qterms), "__t")
        .crossJoin(F.broadcast(stats))
        .withColumn("__s", score)
        .groupBy("__qid", id_col)
        .agg(F.round(F.sum("__s"), round_to).alias("bm25"))
    )
    from pyspark.sql import Window

    w = Window.partitionBy("__qid").orderBy(
        F.col("bm25").desc(), F.col(id_col)
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(F.col("__qid").alias(query_id_col), id_col, "bm25", "rank")
    )


def rrf_fuse(
    rankings: list[DataFrame],
    query_col: str = "query_id",
    doc_col: str = "doc_id",
    rank_col: str = "rank",
    k: int = 60,
    topk: int = 10,
    round_to: int = 6,
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack, Clarke & Buettcher 2009) of N
    retriever rankings — the standard hybrid-search combiner (BM25 +
    dense ANN): score(q, d) = Σᵢ 1/(k + rankᵢ(q, d)), missing entries
    contribute 0. Returns (query, doc, rrf, rank) top-`topk` per query,
    ties broken by doc id.

    Scale shape: each ranking is already top-m per query, so the fusion
    joins/windows touch O(queries × m × N) rows regardless of corpus
    size — the heavy lifting stays in the upstream retrievers. The
    rankings full-outer-join on (query, doc) and the score is ONE fixed
    left-to-right float expression, so results replay bit-identically
    in any engine that evaluates IEEE division/addition in order (the
    DuckDB oracle does)."""
    from functools import reduce

    from pyspark.sql import Window

    tagged = [
        r.select(
            F.col(query_col).alias("__q"),
            F.col(doc_col).alias("__d"),
            F.col(rank_col).alias(f"__r{i}"),
        )
        for i, r in enumerate(rankings)
    ]
    joined = reduce(lambda a, b: a.join(b, ["__q", "__d"], "outer"), tagged)
    score = None
    for i in range(len(rankings)):
        term = F.when(
            F.col(f"__r{i}").isNotNull(),
            F.lit(1.0) / (F.lit(float(k)) + F.col(f"__r{i}")),
        ).otherwise(F.lit(0.0))
        score = term if score is None else score + term
    w = Window.partitionBy("__q").orderBy(
        F.col("__rrf").desc(), F.col("__d").asc()
    )
    return (
        joined.withColumn("__rrf", score)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= topk)
        .select(
            F.col("__q").alias(query_col),
            F.col("__d").alias(doc_col),
            F.round("__rrf", round_to).alias("rrf"),
            "rank",
        )
    )


def inverted_index(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_df: int | None = None,
    min_df: int = 1,
) -> DataFrame:
    """(term, df, postings): sorted doc-id posting list per term — the
    retrieval-side complement of `bm25_score` (and the exact-match
    decontamination lookup structure). `max_df` drops stop-terms whose
    posting lists would be corpus-sized (the same frequency-cap idea as
    the stop-shingle cap in n-gram dedup); `min_df` prunes the hapax
    tail.

    Two passes so no stop-term posting list is ever materialized: pass
    one aggregates per-term df only (a long per term — map-side
    combinable, skew-safe even for corpus-sized terms); terms outside
    [min_df, max_df] are dropped BEFORE pass two collects postings, so
    the surviving-term set bounds every collected array at max_df and
    the hot terms the cap exists for never reach a collect buffer."""
    terms = _spread(df).select(
        F.col(id_col).alias("__id"), F.explode(tokens(text_col)).alias("__t")
    ).distinct()
    dfreq = terms.groupBy("__t").agg(F.count("*").cast("long").alias("df"))
    if min_df > 1:
        dfreq = dfreq.filter(F.col("df") >= min_df)
    if max_df is not None:
        dfreq = dfreq.filter(F.col("df") <= max_df)
    out = terms.join(dfreq, "__t").groupBy("__t", "df").agg(
        F.array_sort(F.collect_list("__id")).alias("postings")
    )
    return out.select(F.col("__t").alias("term"), "df", "postings")


def top_terms(
    df: DataFrame, id_col: str, text_col: str, k: int = 3
) -> DataFrame:
    """TF-IDF-style top-k terms per document: (id, term, tf, df, rank).

    Term frequency and document frequency are exact integers; ranking is
    (tf desc, df asc, term asc) — the rare-term-first tf-idf ordering
    without a float score, so results are deterministic across engines.
    Two keyed shuffles (doc-term count, term doc-frequency), both
    map-side combinable; the df side is a broadcast-sized term table at
    any corpus scale that fits a vocabulary."""
    from pyspark.sql import Window

    terms = df.select(
        F.col(id_col),
        F.explode(
            F.filter(F.split(F.lower(F.col(text_col)), r"\W+"), lambda x: x != "")
        ).alias("term"),
    )
    tf = terms.groupBy(id_col, "term").agg(F.count("*").alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    w = Window.partitionBy(id_col).orderBy(
        F.col("tf").desc(), F.col("df").asc(), F.col("term").asc()
    )
    return (
        tf.join(dfreq, "term")
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(id_col, "term", "tf", "df", "rank")
    )


def gopher_quality(
    df: DataFrame,
    id_col: str,
    text_col: str,
    min_words: int = 5,
    max_words: int = 100000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    min_alpha_word_ratio: float = 0.8,
) -> DataFrame:
    """Gopher/MassiveText-style repetition-free quality rules (Rae et
    al. 2021 §A1.1, the de-facto standard pretraining filter set): word
    count bounds, mean word length bounds, symbol-to-character ratio
    (#/… marks), fraction of words containing an alphabetic character.
    Emits per-rule booleans plus the conjunctive `passes` flag — keep
    the rule columns, not just the verdict, so a pipeline can audit
    WHICH rule rejected a document.

    Pure map-side expression work (split/regex once in a struct
    projection, rules read struct fields) — zero shuffle at any scale."""
    words = F.filter(
        F.split(F.col(text_col), r"\s+"), lambda w: w != ""
    )
    feats = F.struct(
        F.size(words).alias("n_words"),
        F.aggregate(
            F.transform(words, lambda w: F.length(w)),
            F.lit(0), lambda a, x: a + x,
        ).alias("word_chars"),
        F.size(
            F.filter(words, lambda w: w.rlike("[a-zA-Z]"))
        ).alias("alpha_words"),
        F.length(F.col(text_col)).alias("n_chars"),
        (
            F.length(F.col(text_col))
            - F.length(F.regexp_replace(F.col(text_col), r"[#…]", ""))
        ).alias("symbol_chars"),
    )
    n_words = F.col("__g.n_words")
    mean_wl = F.col("__g.word_chars") / F.greatest(n_words, F.lit(1))
    alpha_ratio = F.col("__g.alpha_words") / F.greatest(n_words, F.lit(1))
    symbol_ratio = F.col("__g.symbol_chars") / F.greatest(
        F.col("__g.n_chars"), F.lit(1)
    )
    rules = {
        "ok_word_count": (n_words >= min_words) & (n_words <= max_words),
        "ok_mean_word_len": (mean_wl >= min_mean_word_len)
        & (mean_wl <= max_mean_word_len),
        "ok_symbol_ratio": symbol_ratio <= max_symbol_ratio,
        "ok_alpha_words": alpha_ratio >= min_alpha_word_ratio,
    }
    passes = None
    for c in rules.values():
        passes = c if passes is None else (passes & c)
    return df.withColumn("__g", feats).select(
        F.col(id_col),
        n_words.alias("n_words"),
        F.round(mean_wl, 4).alias("mean_word_len"),
        *[c.alias(n) for n, c in rules.items()],
        passes.alias("passes"),
    )


def classifier_score(
    df: DataFrame,
    id_col: str,
    text_col: str,
    dim: int = 1024,
    round_to: int = 4,
) -> DataFrame:
    """fastText-style hashed linear classifier (the standard learned
    quality filter shape: hash tokens into `dim` buckets, average the
    bucket weights, threshold): (id, n_tokens, margin, keep).

    The weight table is a deterministic arithmetic function of the
    bucket id — w(j) = ((j*1103515245 + 12345) % 2048)/2048 - 0.5, an
    LCG over exact dyadic rationals — standing in for trained weights
    (swap `_bucket_weight` for an `F.element_at` lookup into a
    broadcast weight array to serve a real model; the plan shape is
    identical). Everything is built-in higher-order functions over the
    token array: zero UDFs, zero shuffles, one codegen'd projection —
    at 100 TB this scores at scan speed. Hashing is the engine-portable
    60-bit md5 (functions.hashfn), so the DuckDB oracle reproduces
    every margin bit-for-bit; weights are exact binary fractions
    (k/2048), so the per-doc sum is exact in IEEE double on any engine.
    """
    from hudi_demo_spark.functions.hashfn import portable_hash60

    def _bucket_weight(tok: Column) -> Column:
        j = F.pmod(portable_hash60(tok), F.lit(dim))
        return (
            (j * F.lit(1103515245) + F.lit(12345)) % F.lit(2048)
        ) / F.lit(2048.0) - F.lit(0.5)

    stats = bind(
        tokens(text_col),
        lambda toks: F.struct(
            F.size(toks).alias("n"),
            F.aggregate(
                toks, F.lit(0.0), lambda acc, t: acc + _bucket_weight(t)
            ).alias("s"),
        ),
    )
    n, s = F.col("__c.n"), F.col("__c.s")
    margin = s / F.greatest(n, F.lit(1))
    return df.withColumn("__c", stats).select(
        F.col(id_col),
        n.cast("long").alias("n_tokens"),
        F.round(margin, round_to).alias("margin"),
        (margin > 0).alias("keep"),
    )


# ---------------------------------------------------------------- BPE

def _word_counts(df: DataFrame, text_col: str) -> DataFrame:
    """(word, weight) over the corpus — ONE scan + one agg; everything
    after trains on this table, whose size is the DISTINCT vocabulary,
    not the corpus."""
    return (
        df.select(
            F.explode(
                F.split(F.lower(F.col(text_col)), r"\s+")
            ).alias("word")
        )
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").alias("weight"))
    )


def train_bpe(
    df: DataFrame,
    text_col: str,
    num_merges: int = 50,
    vocab_limit: int | None = None,
    sample_fraction: float | None = None,
    sample_seed: int = 42,
) -> list[tuple[str, str]]:
    """Distributed byte-pair-encoding trainer (Sennrich et al. 2016),
    the standard subword-vocabulary step of a training-data pipeline.

    Scale shape: the corpus is scanned ONCE for (word, weight); each of
    the `num_merges` iterations is one JVM-side aggregation over the
    cached word table (adjacent-pair explode → weighted count → argmax)
    plus one codegen'd `aggregate` fold that applies the winning merge
    — per-iteration cost ∝ distinct words, never corpus size, and the
    driver holds only the merge list (K pairs). Ties break
    deterministically on (count desc, pair asc).

    No Python row-UDFs: pair extraction is `transform(slice(...))`,
    merging is a left-to-right greedy `aggregate` fold — the exact
    reference semantics (test_operators differential vs a pure-Python
    BPE).

    `sample_fraction` trains on a DETERMINISTIC content-hash sample of
    the documents (keep iff `xxhash64(text, seed) mod 1e6 <
    fraction*1e6`) — the 100 TB contract: vocabulary training must not
    imply `num_merges` full-corpus passes, and the same corpus + seed
    reproduces the same merge list regardless of partitioning or row
    order (a `rand()` sample would not)."""
    if sample_fraction is not None and sample_fraction < 1.0:
        df = df.filter(
            F.pmod(
                F.abs(F.xxhash64(F.col(text_col), F.lit(sample_seed))),
                F.lit(1_000_000),
            )
            < int(sample_fraction * 1_000_000)
        )
    wc = _word_counts(df, text_col)
    if vocab_limit is not None:
        # standard trainer cap: frequency-ranked head of the vocabulary
        # (deterministic tie-break on the word) — rare-word tails cost
        # per-iteration latency and barely influence early merges
        wc = wc.orderBy(
            F.col("weight").desc(), F.col("word").asc()
        ).limit(vocab_limit)
    words = (
        wc.withColumn(
            "syms",
            F.concat(
                F.split(F.col("word"), ""),
                F.array(F.lit("</w>")),
            ),
        )
        .persist()
    )
    merges: list[tuple[str, str]] = []
    cached = [words]  # every persisted handle, unpersisted on exit
    try:
        cur = words
        for _ in range(num_merges):
            top = (
                cur.select(
                    "weight",
                    F.explode(
                        F.expr(
                            "transform(slice(syms, 1, size(syms) - 1), "
                            "(x, i) -> struct(x AS a, "
                            "element_at(syms, i + 2) AS b))"
                        )
                    ).alias("p"),
                )
                .groupBy("p")
                .agg(F.sum("weight").alias("n"))
                .orderBy(F.col("n").desc(), F.col("p").asc())
                .limit(1)
                .collect()
            )
            if not top:
                break
            a, b = top[0]["p"]["a"], top[0]["p"]["b"]
            merges.append((a, b))
            cur = cur.withColumn("syms", _merge_pair_expr("syms", a, b))
            if len(merges) % 10 == 0:
                # bound the fold-expression depth: materialize the
                # merged symbol arrays every few iterations (and retire
                # the previous cached copy — leaving every 10th
                # generation pinned would leak storage memory on long
                # trainings)
                cur = cur.select("word", "weight", "syms").persist()
                cur.count()  # materialize before dropping the parent
                cached[-1].unpersist()
                cached.append(cur)
    finally:
        for c in cached:
            c.unpersist()
    return merges


def _merge_pair_expr(col: str, a: str, b: str) -> F.Column:
    """Greedy left-to-right merge of adjacent (a, b) → a||b inside an
    array<string> column, as a codegen'd aggregate fold."""
    qa, qb = a.replace("'", "\\'"), b.replace("'", "\\'")
    return F.expr(
        f"aggregate({col}, cast(array() as array<string>), (acc, x) -> "
        f"CASE WHEN size(acc) > 0 AND element_at(acc, -1) = '{qa}' "
        f"AND x = '{qb}' THEN concat(slice(acc, 1, size(acc) - 1), "
        f"array('{qa}' || '{qb}')) ELSE concat(acc, array(x)) END)"
    )


def apply_bpe(
    df: DataFrame,
    id_col: str,
    text_col: str,
    merges: list[tuple[str, str]],
) -> DataFrame:
    """Tokenize with a trained merge table. Scale shape: the merge
    sequence is applied to the corpus's DISTINCT words only (an
    Arrow-batched pandas stage over the vocabulary table — python cost
    ∝ vocabulary, not corpus), then joined back to the exploded corpus
    by word; the per-document token ids/counts come from one keyed
    re-aggregation. Returns (id, n_tokens, tokens)."""
    import pandas as pd

    ranks = {pair: i for i, pair in enumerate(merges)}

    def _tok(batches):
        for pdf in batches:
            out = []
            for w in pdf["word"]:
                syms = list(w) + ["</w>"]
                while len(syms) > 1:
                    best, bi = None, None
                    for i in range(len(syms) - 1):
                        r = ranks.get((syms[i], syms[i + 1]))
                        if r is not None and (best is None or r < best):
                            best, bi = r, i
                    if best is None:
                        break
                    syms[bi : bi + 2] = [syms[bi] + syms[bi + 1]]
                out.append(syms)
            yield pd.DataFrame({"word": pdf["word"], "toks": out})

    vocab = _word_counts(df, text_col).select("word")
    word_toks = vocab.mapInPandas(_tok, "word string, toks array<string>")
    exploded = (
        df.select(
            F.col(id_col),
            F.posexplode(
                F.split(F.lower(F.col(text_col)), r"\s+")
            ).alias("pos", "word"),
        )
        .filter(F.col("word") != "")
    )
    return (
        exploded.join(word_toks, "word")
        .groupBy(id_col)
        .agg(
            F.flatten(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("pos", "toks"))
                    ),
                    lambda s: s["toks"],
                )
            ).alias("tokens")
        )
        .select(
            id_col,
            F.size("tokens").alias("n_tokens"),
            "tokens",
        )
    )
