"""DSIR importance-weighting invariants (operators/dsir.py)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from go_nonrat_annotation_pipeline_spark.operators import dsir as DS


def _corpus(spark):
    # 6 "target-ish" docs full of (alpha beta) bigrams, 6 "raw-ish" docs
    # of unrelated words, 2 mixed
    rows = (
        [(i, "alpha beta alpha beta alpha beta", "tgt") for i in range(6)]
        + [
            (10 + i, "red green blue yellow purple orange", "web")
            for i in range(6)
        ]
        + [(20, "alpha beta red green", "web"), (21, "x", "web")]
    )
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


def test_ngrams_expression(spark):
    df = spark.createDataFrame(
        [(1, "a b c d"), (2, "a"), (3, ""), (4, "a  b")],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: r.g
        for r in df.select(
            "doc_id", DS.word_ngrams(F.col("text"), 2).alias("g")
        ).collect()
    }
    assert got[1] == ["a b", "b c", "c d"]
    assert got[2] == []
    assert got[3] == []
    assert got[4] == ["a b"]  # repeated-space empty tokens dropped


def test_weights_favor_target_buckets(spark):
    docs = _corpus(spark)
    tgt = docs.where(F.col("source") == "tgt")
    w = DS.dsir_bucket_weights(tgt, docs, buckets=1 << 10).collect()
    assert all(r.wt_ppm == (r.t_cnt + 1) * DS.PPM // (r.r_cnt + 1) for r in w)
    # buckets never seen in target sit at the smoothing floor
    tgt_only = [r for r in w if r.t_cnt > 0]
    raw_only = [r for r in w if r.t_cnt == 0]
    assert tgt_only and raw_only
    assert min(r.wt_ppm for r in tgt_only) > max(r.wt_ppm for r in raw_only)


def test_scores_and_selection(spark):
    docs = _corpus(spark)
    tgt = docs.where(F.col("source") == "tgt")
    w = DS.dsir_bucket_weights(tgt, docs, buckets=1 << 10)
    scored = DS.dsir_scores(docs, w, buckets=1 << 10)
    rows = {r.doc_id: r for r in scored.collect()}
    # the 1-token doc emits no bigrams and is absent
    assert 21 not in rows and len(rows) == 13
    assert all(r.norm_ppm == r.score_ppm // r.n_grams for r in rows.values())
    # every pure-target doc outranks every pure-web doc
    assert min(rows[i].norm_ppm for i in range(6)) > max(
        rows[10 + i].norm_ppm for i in range(6)
    )
    # mixed doc lands strictly between
    assert (
        max(rows[10 + i].norm_ppm for i in range(6))
        < rows[20].norm_ppm
        < min(rows[i].norm_ppm for i in range(6))
    )

    sel = DS.dsir_select(scored, 0.5).collect()
    assert len(sel) == math.ceil(0.5 * 13)
    # the selected set is exactly the top by (norm_ppm desc, id asc)
    expect = sorted(rows.values(), key=lambda r: (-r.norm_ppm, r.doc_id))[:7]
    assert sorted(r.doc_id for r in sel) == sorted(r.doc_id for r in expect)
    # boundary fractions
    assert DS.dsir_select(scored, 1.0).count() == 13
    assert DS.dsir_select(scored, 0.0).count() == 0
