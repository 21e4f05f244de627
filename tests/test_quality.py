"""Gopher-rule quality features and repetition signals on crafted docs."""

from __future__ import annotations

from pyspark.sql import functions as F

from go_nonrat_annotation_pipeline_spark.functions import hashing as H
from go_nonrat_annotation_pipeline_spark.functions import text as TX


def _feats(spark, text):
    df = spark.createDataFrame([(text,)], "text string")
    feats = TX.gopher_features(F.col("text"))
    return df.select(
        *[v.alias(k) for k, v in feats.items()],
        TX.gopher_pass(feats, min_words=3).alias("keep"),
    ).collect()[0]


def test_gopher_features_exact(spark):
    r = _feats(spark, "the cat sat of mat")
    assert r["n_words"] == 5
    # char sum = 3+3+3+2+3 = 14 -> mean*100 = 280
    assert r["mean_word_len_x100"] == 280
    assert r["alpha_word_permille"] == 1000
    assert r["stop_hits"] == 2  # 'the', 'of'
    assert not r["keep"]  # mean word len 2.8 < 3.0


def test_gopher_pass_happy_path(spark):
    r = _feats(spark, "the quick brown fox jumps over a lazy dog")
    assert r["keep"]


def test_gopher_rejects_numeric_soup(spark):
    r = _feats(spark, "the 123 456 789 000 111 a 333 444 555")
    assert r["alpha_word_permille"] == 200
    assert not r["keep"]


def test_dup_shingle_permille(spark):
    # 'a b c a b c a b c' -> 5-shingles: (abcab)(bcabc)(cabca)(abcab)(bcabc)
    # 5 shingles, 3 distinct -> 2 dups -> 400 permille
    df = spark.createDataFrame([("a b c a b c a b c",), ("a b c d e f",)], "text string")
    got = df.select(
        TX.dup_shingle_permille(H.word_hashes(TX.words(F.col("text"))), 5).alias("p")
    ).collect()
    assert [r["p"] for r in got] == [400, 0]


def test_dup_shingle_short_doc_zero(spark):
    df = spark.createDataFrame([("one two",)], "text string")
    [r] = df.select(
        TX.dup_shingle_permille(H.word_hashes(TX.words(F.col("text"))), 5).alias("p")
    ).collect()
    assert r["p"] == 0
