"""Unit + property tests for the length-bounded fragment packer
(the engine's one custom kernel; SURVEY.md §2.4 A3/A4)."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from go_nonrat_annotation_pipeline_spark.functions.packer import (
    pack_fragments,
    pack_fragments_py,
)


def spark_pack(spark, tokens, max_len, sep="|"):
    df = spark.createDataFrame([(tokens,)], "toks array<string>")
    return df.select(pack_fragments(F.col("toks"), max_len, sep).alias("f")).first()["f"]


def test_empty(spark):
    assert spark_pack(spark, [], 10) == []


def test_single_token(spark):
    assert spark_pack(spark, ["abc"], 10) == ["abc"]


def test_greedy_packing(spark):
    # 'aa|bb' = 5 chars fits in 6; adding '|cc' would make 8 > 6
    assert spark_pack(spark, ["aa", "bb", "cc"], 6) == ["aa|bb", "cc"]


def test_exact_fit(spark):
    assert spark_pack(spark, ["aa", "bb"], 5) == ["aa|bb"]


def test_oversized_token_hard_cut(spark):
    # mirrors WithInfoConsolidator.java:106-110 hard-cut fallback
    assert spark_pack(spark, ["abcdefghij"], 4) == ["abcd", "efgh", "ij"]


def test_oversized_token_mixed(spark):
    out = spark_pack(spark, ["aaaaaa", "b"], 4)
    assert out == pack_fragments_py(["aaaaaa", "b"], 4)
    assert all(len(f) <= 4 for f in out)


def test_fragment_lengths_bounded(spark):
    toks = [f"tok{i}" for i in range(50)]
    out = spark_pack(spark, toks, 17)
    assert all(len(f) <= 17 for f in out)
    # round trip: splitting fragments returns the original token sequence
    flat = [t for f in out for t in f.split("|")]
    assert flat == toks


@settings(max_examples=25, deadline=None)
@given(
    toks=st.lists(st.text(alphabet="abcXYZ09", min_size=1, max_size=12), max_size=20),
    max_len=st.integers(min_value=3, max_value=30),
)
def test_property_matches_python_reference(spark, toks, max_len):
    assert spark_pack(spark, toks, max_len) == pack_fragments_py(toks, max_len)
