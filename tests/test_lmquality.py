"""LM-quality operators (operators/lmquality): model invariants,
hand-computed scores on a tiny corpus, OOV counting, KL properties."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from go_nonrat_annotation_pipeline_spark.operators import lmquality as LM


def _docs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, text string, source string"
    )


def test_bigram_lm_counts_and_vocab(spark):
    train = _docs(spark, [(1, "abab", "s"), (2, "ba", "s")])
    lm = LM.train_bigram_lm(train)
    bg = {r.bg: r.cnt2 for r in lm["bg"].collect()}
    # "abab" -> ab, ba, ab ; "ba" -> ba
    assert bg == {"ab": 2, "ba": 2}
    c1 = {r.c1: r.cnt1 for r in lm["c1"].collect()}
    assert c1 == {"a": 2, "b": 2}
    assert lm["v"] == 2  # distinct second chars {b, a}


def test_cross_entropy_hand_computed(spark):
    train = _docs(spark, [(1, "abab", "s"), (2, "ba", "s")])
    lm = LM.train_bigram_lm(train)
    # score "aba": bigrams ab, ba — both seen.
    # term(ab) = ln((cnt1_a + V) / (cnt2_ab + 1)) = ln(4/3)
    # term(ba) = ln((cnt1_b + V) / (cnt2_ba + 1)) = ln(4/3)
    test = _docs(spark, [(10, "aba", "s")])
    row = LM.score_cross_entropy(test, lm, 0.1, 0.2).collect()[0]
    assert row.n_bigrams == 2
    assert row.ce == round(math.log(4 / 3), 6)
    assert row.bucket == "tail"  # ce ≈ 0.2877 ≥ 0.2


def test_cross_entropy_oov_falls_back_to_vocab(spark):
    train = _docs(spark, [(1, "abab", "s")])
    lm = LM.train_bigram_lm(train)  # cnt1: a→2, b→1 ; V = 2 ({a, b})
    # "zz": unseen bigram AND unseen first char -> term = ln((0+V)/1)
    test = _docs(spark, [(10, "zz", "s")])
    row = LM.score_cross_entropy(test, lm, 10.0, 20.0).collect()[0]
    assert row.ce == round(math.log(2), 6)
    assert row.bucket == "head"


def test_short_docs_are_absent(spark):
    train = _docs(spark, [(1, "abab", "s")])
    lm = LM.train_bigram_lm(train)
    test = _docs(spark, [(10, "x", "s"), (11, "", "s"), (12, "ab", "s")])
    ids = [r.doc_id for r in LM.score_cross_entropy(test, lm, 1, 2).collect()]
    assert ids == [12]  # length<2 docs produce no bigrams, no score


def test_oov_stats_counts(spark):
    train = _docs(spark, [(1, "the cat sat", "a")])
    eval_df = _docs(
        spark, [(2, "the dog sat", "a"), (3, "zebra quark", "b")]
    )
    rows = {r.source: r for r in LM.oov_stats(train, eval_df).collect()}
    assert rows["a"].n_tokens == 3 and rows["a"].n_oov == 1
    assert rows["a"].oov_permille == 333
    assert rows["b"].n_tokens == 2 and rows["b"].n_oov == 2
    assert rows["b"].oov_permille == 1000


def test_kl_zero_on_identical_mixture(spark):
    ref = _docs(spark, [(i, "t", "s%d" % (i % 2)) for i in range(10)])
    out = LM.mixture_drift_kl(ref, ref).collect()
    assert all(r.kl_contrib == 0.0 for r in out)
    assert {r.source for r in out} == {"s0", "s1"}


def test_kl_detects_drift_direction(spark):
    # ref: 8×a / 2×b; cur: 2×a / 8×b — a over-represented in ref
    ref = _docs(
        spark,
        [(i, "t", "a") for i in range(8)] + [(8, "t", "b"), (9, "t", "b")],
    )
    cur = _docs(
        spark,
        [(0, "t", "a"), (1, "t", "a")] + [(i, "t", "b") for i in range(2, 10)],
    )
    rows = {r.source: r.kl_contrib for r in LM.mixture_drift_kl(ref, cur).collect()}
    assert rows["a"] > 0  # p > q → positive contribution
    assert rows["b"] < 0
