"""Edge-case tests for operators/corpus.py — the sf fixtures have no
empty/short docs, so the boundary logic (n < chunk, n < ngram, empty
text, bucket-phase prefix sum) is pinned here."""

import pytest
from pyspark.sql import functions as F

from hudi_demo_spark.operators.corpus import (
    chunk_documents,
    decontaminate,
    pack_offsets,
    redact_pii,
    repetition_score,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_chunk_short_and_boundary(spark):
    df = _docs(
        spark,
        [
            (1, ""),  # 0 tokens -> one empty chunk
            (2, "a b c"),  # < chunk -> one chunk
            (3, " ".join(f"t{i}" for i in range(32))),  # == chunk -> one chunk
            (4, " ".join(f"t{i}" for i in range(33))),  # chunk+1 -> two chunks
        ],
    )
    out = {
        (r.doc_id, r.chunk_id): (r.chunk_text, r.chunk_n_tokens)
        for r in chunk_documents(df, "doc_id", "text", 32, 24).collect()
    }
    assert out[(1, 0)] == ("", 0)
    assert out[(2, 0)] == ("a b c", 3)
    assert (3, 1) not in out and out[(3, 0)][1] == 32
    assert out[(4, 1)] == (" ".join(f"t{i}" for i in range(24, 33)), 9)


def test_chunk_full_coverage(spark):
    n = 100
    df = _docs(spark, [(1, " ".join(f"w{i}" for i in range(n)))])
    rows = chunk_documents(df, "doc_id", "text", 32, 24).collect()
    covered = set()
    for r in rows:
        start = r.chunk_id * 24
        covered |= set(range(start, start + r.chunk_n_tokens))
    assert covered == set(range(n))


def test_pack_offsets_matches_naive_cumsum(spark):
    # scrambled ids across buckets; n_buckets > #docs exercises empties
    rows = [(i * 7 % 50, f"doc {i} " + "tok " * (i % 13)) for i in range(50)]
    df = _docs(spark, [(i, t.strip()) for i, t in rows])
    got = {
        r.doc_id: (r.n_tokens, r.start_token, r.first_seq, r.last_seq)
        for r in pack_offsets(df, "doc_id", "text", seq_len=16, n_buckets=8).collect()
    }
    # naive: global cumsum in id order
    lens = sorted((i, len(t.strip().split()) + 1) for i, t in rows)
    off = 0
    for i, l in lens:
        assert got[i] == (l - 1, off, off // 16, (off + l - 1) // 16), i
        off += l


def test_decontaminate_exact_overlap_only(spark):
    clean = "alpha beta gamma delta epsilon zeta eta theta"
    shared = "one two three four five six seven eight nine"
    train = _docs(spark, [(1, clean), (2, shared + " tail"), (3, "short text")])
    test = _docs(spark, [(100, "lead " + shared)])
    kept = sorted(
        r.doc_id
        for r in decontaminate(train, test, "doc_id", "text", ngram=8).collect()
    )
    # doc 2 shares the 8-gram "one..eight"; doc 3 is too short to shingle
    assert kept == [1, 3]


def test_repetition_score_bounds(spark):
    df = _docs(spark, [(1, "a b"), (2, "x y z x y z x y z")])
    got = {r.doc_id: r for r in repetition_score(df, "doc_id", "text", 3).collect()}
    assert (got[1].n_grams, got[1].dup_ratio) == (0, 0.0)
    assert got[2].n_grams == 7 and got[2].n_distinct_grams == 3
    assert got[2].dup_ratio == pytest.approx(4 / 7, abs=1e-4)


def test_redact_pii_patterns(spark):
    df = spark.createDataFrame(
        [
            (1, "mail me at jo.doe+x@sub.example.org now"),
            (2, "server 10.0.255.3 and call +44-207-946-0958"),
            (3, "no pii here, just 3.14 and v1.2.3"),
        ],
        "id long, text string",
    )
    got = {r.id: r.text for r in redact_pii(df, "text").collect()}
    assert got[1] == "mail me at [EMAIL] now"
    assert got[2] == "server [IP] and call [PHONE]"
    assert got[3] == "no pii here, just 3.14 and v1.2.3"


def test_dsir_weights_prefer_target_like_docs(spark):
    """DSIR semantics: raw docs sharing the target domain's n-grams
    must score higher log-importance than out-of-domain docs; weights
    are deterministic (portable hash, no RNG)."""
    from hudi_demo_spark.operators.corpus import dsir_weights

    rows = [
        # target domain: cooking
        (1, "whisk the eggs and fold the flour gently", "target"),
        (2, "simmer the sauce and season the broth with salt", "target"),
        (3, "knead the dough and proof the yeast overnight", "target"),
        # raw pool: one cooking-like, two out-of-domain
        (10, "fold the flour and whisk the eggs with salt", "raw"),
        (11, "compile the kernel and link the object files", "raw"),
        (12, "the defendant appealed the verdict to the court", "raw"),
        # empty / whitespace-only / single-token docs must not crash
        # the bigram slice (review regression)
        (13, "", "raw"),
        (14, "   ", "raw"),
        (15, "solo", "raw"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, src string")
    w = {r["doc_id"]: r["log_weight"]
         for r in dsir_weights(df, "doc_id", "text",
                               "src = 'target'").collect()}
    assert w[10] > w[11] and w[10] > w[12]
    assert 13 not in w and 14 not in w  # featureless docs drop out
    assert 15 in w  # single token → one unigram feature, no bigrams
    w2 = {r["doc_id"]: r["log_weight"]
          for r in dsir_weights(df, "doc_id", "text",
                                "src = 'target'").collect()}
    assert w == w2  # deterministic


def test_retention_filter_floor_and_groups(spark):
    """retention is a FLOOR: ties at the cutoff are kept; per-group
    calibration picks each group's own cutoff; the global path works;
    bad retention raises."""
    from hudi_demo_spark.operators.corpus import retention_filter

    rows = [(i, "a", float(i)) for i in range(10)] + [
        (100 + i, "b", float(100)) for i in range(10)  # all-ties group
    ]
    df = spark.createDataFrame(rows, "id long, g string, s double")
    out = retention_filter(df, "s", 0.4, group_cols=["g"])
    by_g = {
        r["g"]: sorted(x["id"] for x in out.filter(F.col("g") == r["g"]).collect())
        for r in out.select("g").distinct().collect()
    }
    # group a: top 40% of 0..9 -> cutoff q(0.6)=5.4 -> ids 6..9
    assert by_g["a"] == [6, 7, 8, 9]
    # group b: every score ties the cutoff -> ALL kept (floor, not cap)
    assert by_g["b"] == list(range(100, 110))
    # global: one cutoff across both groups
    n_glob = retention_filter(df, "s", 0.5).count()
    assert n_glob == 10  # top half = the 100-valued rows
    with pytest.raises(ValueError):
        retention_filter(df, "s", 0.0)
