"""Boilerplate-strip invariants (operators/boilerplate.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from go_nonrat_annotation_pipeline_spark.operators import boilerplate as BP


def _corpus(spark):
    # "nav bar home" opens 5 docs (boilerplate at max_docs<5);
    # each doc also has unique content; doc 30 is pure boilerplate;
    # doc 40 is empty
    rows = [
        (i, f"nav bar home unique{i} words here tail{i}") for i in range(5)
    ] + [
        (20, "completely original content stream"),
        (30, "nav bar home"),
        (40, ""),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_chunks_shape(spark):
    df = spark.createDataFrame(
        [(1, "a b c d e f g"), (2, "")], "doc_id long, text string"
    )
    got = sorted(
        (r.pos, r.chunk)
        for r in BP.token_chunks(df, chunk_tokens=3)
        .where(F.col("_id") == 1)
        .collect()
    )
    # trailing partial chunk kept
    assert got == [(0, "a b c"), (1, "d e f"), (2, "g")]
    # empty doc emits nothing
    assert (
        BP.token_chunks(df, chunk_tokens=3).where(F.col("_id") == 2).count()
        == 0
    )


def test_doc_freq_distinct(spark):
    df = spark.createDataFrame(
        [(1, "x y z x y z"), (2, "x y z")], "doc_id long, text string"
    )
    freq = {
        r.chunk: r.n_docs
        for r in BP.chunk_doc_freq(
            BP.token_chunks(df, chunk_tokens=3)
        ).collect()
    }
    # chunk repeated inside doc 1 still counts it once
    assert freq["x y z"] == 2


def test_strip_rewrites_and_conserves(spark):
    docs = _corpus(spark)
    out = {
        r.doc_id: r
        for r in BP.boilerplate_strip(
            docs, chunk_tokens=3, max_docs=3
        ).collect()
    }
    # empty doc emits no chunks -> absent (documented contract)
    assert 40 not in out and len(out) == 7
    # the 6-way shared "nav bar home" chunk is stripped everywhere
    for i in range(5):
        r = out[i]
        assert r.clean_text == f"unique{i} words here tail{i}"
        assert (r.n_kept, r.n_dropped) == (2, 1)
    # unique doc untouched
    assert out[20].clean_text == "completely original content stream"
    assert out[20].n_dropped == 0
    # pure-boilerplate doc survives with empty text
    assert out[30].clean_text == "" and out[30].n_kept == 0
