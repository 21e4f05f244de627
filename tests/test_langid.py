"""Trained language-ID (operators/langid): perfect separation on a
separable synthetic corpus, determinism, and bounded-profile contract."""

from __future__ import annotations

from pyspark.sql import functions as F

from go_nonrat_annotation_pipeline_spark.operators import langid as L


def _corpus(spark):
    # two clearly separable "languages": vowel-heavy vs consonant-heavy
    rows = []
    for i in range(40):
        rows.append((i * 2, "aeio aiea eoae aiee oiea aeio eaio", "vowelish"))
        rows.append((i * 2 + 1, "krtz krzt trkz ztrk rkzt tkrz zrtk", "consonantish"))
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def test_separable_corpus_classifies_perfectly(spark):
    docs = _corpus(spark)
    train = docs.where(F.col("doc_id") < 60)
    test = docs.where(F.col("doc_id") >= 60)
    prof = L.train_profiles(train, top_k=10)
    # profile is bounded: at most top_k rows per language
    sizes = {r.lang: r.n for r in prof.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert all(n <= 10 for n in sizes.values())
    pred = L.classify(test, prof).join(
        docs.select("doc_id", "lang"), "doc_id"
    )
    rows = pred.collect()
    assert len(rows) == 20
    assert all(r.pred_lang == r.lang for r in rows)


def test_classify_is_deterministic(spark):
    docs = _corpus(spark)
    prof = L.train_profiles(docs, top_k=10)
    a = sorted(tuple(r) for r in L.classify(docs, prof).collect())
    b = sorted(tuple(r) for r in L.classify(docs, prof).collect())
    assert a == b
