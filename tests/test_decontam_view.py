"""Incrementally-maintained decontamination view: the clean training
corpus as a derived table tracking an append-only eval set. Every
refresh must converge to the batch operator's end state
(`corpus.decontaminate(train_end, eval_end)`), and a mutated-window
refresh must land as ONE commit."""

import pytest
from pyspark.sql import functions as F

from hudi_demo_spark.engine.decontam_view import (
    create_decontam_view,
    refresh_decontam_view,
)
from hudi_demo_spark.engine.timeline import Timeline
from hudi_demo_spark.operators.corpus import decontaminate

BASE = [
    # ids 1-6 train; 100/101 eval. 2 and 5 share a full 4-gram with eval.
    (1, "alpha beta gamma delta unique one"),
    (2, "shared phrase from the benchmark suite here"),
    (3, "totally unrelated training text sample"),
    (4, "another clean document with fresh words"),
    (5, "contains the second eval sentence verbatim inside"),
    (6, "clean six words of original content"),
]
EVAL0 = [(100, "shared phrase from the benchmark suite")]
EVAL1 = [(101, "the second eval sentence verbatim")]


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id int, text string")


def _ids(engine, t="clean"):
    return sorted(r.doc_id for r in engine.read(t).select("doc_id").collect())


def _setup(engine, spark):
    engine.create_table("train", record_key="doc_id")
    engine.create_table("ev", record_key="doc_id")
    engine.insert(_df(spark, BASE[:4]), "train")
    engine.insert(_df(spark, EVAL0), "ev")
    create_decontam_view(engine, "train", "ev", "clean", "doc_id", "text",
                         ngram=4)


def _batch_ids(engine, spark):
    """The batch operator's end state over the CURRENT tables."""
    out = decontaminate(
        engine.read("train"), engine.read("ev"), "doc_id", "text", ngram=4
    )
    return sorted(r.doc_id for r in out.select("doc_id").collect())


def test_initial_screen_matches_batch(engine, spark):
    _setup(engine, spark)
    refresh_decontam_view(engine, "clean")
    assert _ids(engine) == [1, 3, 4] == _batch_ids(engine, spark)


def test_eval_append_evicts_in_one_commit(engine, spark):
    _setup(engine, spark)
    refresh_decontam_view(engine, "clean")
    engine.insert(_df(spark, BASE[4:]), "train")  # 5 dirty vs FUTURE eval
    refresh_decontam_view(engine, "clean")
    assert 5 in _ids(engine)  # eval doc 101 not there yet
    engine.insert(_df(spark, EVAL1), "ev")
    tl = Timeline(engine._resolve("clean").path)
    before = len(tl.instants())
    refresh_decontam_view(engine, "clean")
    assert len(tl.instants()) == before + 1  # eviction = one commit
    assert _ids(engine) == [1, 3, 4, 6] == _batch_ids(engine, spark)


def test_train_dml_rescreens_changed_ids(engine, spark):
    _setup(engine, spark)
    engine.insert(_df(spark, BASE[4:]), "train")
    engine.insert(_df(spark, EVAL1), "ev")
    refresh_decontam_view(engine, "clean")
    assert _ids(engine) == [1, 3, 4, 6]
    # an UPDATE that cleans doc 2 must re-admit it; a DELETE evicts 4;
    # both land through one mutated-window refresh (one commit)
    engine.update(
        "train", set={"text": F.lit("rewritten clean text now")},
        where="doc_id = 2",
    )
    engine.delete("train", "doc_id = 4")
    tl = Timeline(engine._resolve("clean").path)
    before = len(tl.instants())
    refresh_decontam_view(engine, "clean")
    assert len(tl.instants()) == before + 1
    assert _ids(engine) == [1, 2, 3, 6] == _batch_ids(engine, spark)


def test_noop_refresh_writes_nothing(engine, spark):
    _setup(engine, spark)
    refresh_decontam_view(engine, "clean")
    tl = Timeline(engine._resolve("clean").path)
    before = len(tl.instants())
    assert refresh_decontam_view(engine, "clean") is None
    assert len(tl.instants()) == before


def test_eval_must_be_append_only(engine, spark):
    _setup(engine, spark)
    refresh_decontam_view(engine, "clean")
    engine.delete("ev", "doc_id = 100")
    with pytest.raises(NotImplementedError, match="append-only"):
        refresh_decontam_view(engine, "clean")


def test_simultaneous_eval_and_train_windows(engine, spark):
    """Both sources moved in one window: new train docs screen against
    the eval END state, old view rows re-screen against the NEW grams,
    and a changed doc whose new text is clean stays admitted even when
    its OLD text matched a new gram."""
    _setup(engine, spark)
    refresh_decontam_view(engine, "clean")  # view: 1, 3, 4
    # doc 3's old text will be planted into eval (would evict it), but
    # doc 3 is simultaneously updated to clean text — it must survive
    engine.insert(
        _df(spark, [(102, "totally unrelated training text")]), "ev"
    )
    engine.update(
        "train", set={"text": F.lit("replacement words entirely new")},
        where="doc_id = 3",
    )
    engine.insert(_df(spark, BASE[4:]), "train")
    refresh_decontam_view(engine, "clean")
    assert _ids(engine) == _batch_ids(engine, spark)
    assert 3 in _ids(engine)
