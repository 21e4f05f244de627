"""Retrieval operators (operators/retrieval): TF-IDF arithmetic on a
hand-computed example, BM25 ordering sanity, q-gram fuzzy-join recall
and cap behavior."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from go_nonrat_annotation_pipeline_spark.operators.retrieval import (
    bm25_scores,
    qgram_fuzzy_pairs,
    tfidf_top_terms,
)


def test_tfidf_hand_computed(spark):
    docs = spark.createDataFrame(
        [
            (1, "a a b"),
            (2, "a c"),
        ],
        "doc_id long, text string",
    )
    out = {
        (r.doc_id, r.term): (r.tf, r.df, r.tfidf)
        for r in tfidf_top_terms(docs, k=3).collect()
    }
    # N=2; df(a)=2, df(b)=1, df(c)=1
    idf_a = math.log(3.0 / 3.0) + 1.0  # 1.0
    idf_b = math.log(3.0 / 2.0) + 1.0
    assert out[(1, "a")] == (2, 2, round(2 * idf_a, 6))
    assert out[(1, "b")] == (1, 1, round(1 * idf_b, 6))
    assert out[(2, "c")][2] == round(idf_b, 6)


def test_bm25_prefers_matching_docs(spark):
    docs = spark.createDataFrame(
        [
            (1, "spark spark spark merge"),
            (2, "spark other words here"),
            (3, "nothing relevant at all"),
        ],
        "doc_id long, text string",
    )
    rows = bm25_scores(docs, ["spark", "merge"], k=3).collect()
    ranked = [r.doc_id for r in sorted(rows, key=lambda r: r.rank)]
    # doc 3 has no query terms → absent; doc 1 outranks doc 2
    assert ranked == [1, 2]


def test_qgram_fuzzy_pairs_recall_and_verify(spark):
    df = spark.createDataFrame(
        [
            (1, "annotation"),
            (2, "annotatior"),   # dist 1 — shares many grams
            (3, "annotation!!"),  # dist 2
            (4, "completely-different"),
        ],
        "id long, name string",
    )
    got = {
        (r.id_a, r.id_b): r.dist
        for r in qgram_fuzzy_pairs(df, "id", F.col("name"), 2, 3, 64).collect()
    }
    assert got[(1, 2)] == 1
    assert got[(1, 3)] == 2
    assert (1, 4) not in got and (2, 4) not in got


def test_qgram_hot_cap_drops_universal_grams(spark):
    # every key shares the hot prefix; the discriminative tail grams
    # survive the cap and still produce the true close pair
    rows = [(i, f"prefixprefix{i:04d}") for i in range(1, 301)]
    df = spark.createDataFrame(rows, "id long, name string")
    out = qgram_fuzzy_pairs(df, "id", F.col("name"), 1, 3, 64)
    got = {(r.id_a, r.id_b) for r in out.collect()}
    # ids 1 and 2 → "...0001" vs "...0002": distance 1, share gram "000"
    # only if it survives the cap; freq("000") ≈ 300 > 64 so it is hot,
    # but "001"/"002" families are cold — the pair must be found via a
    # surviving shared gram ("00" window grams differ; check presence of
    # at least SOME true close pairs rather than exhaustive recall)
    close = {(a, b) for (a, b) in got if abs(a - b) <= 10}
    assert close, "cap dropped every candidate — tune max_gram_freq"


# ---------------------------------------------------------------------------
# rare-token corpus-frequency quality
# ---------------------------------------------------------------------------
def test_rare_token_stats_known_answer(spark):
    from pyspark.sql import functions as F

    from go_nonrat_annotation_pipeline_spark.operators.retrieval import (
        rare_token_stats,
    )

    docs = spark.createDataFrame(
        [
            (1, "a a a b"),      # 'b' appears twice in corpus -> rare at <3
            (2, "a b zz"),       # 'zz' once -> rare
            (3, "a a a a"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in rare_token_stats(docs, rare_below=3).collect()}
    assert out[1].n_tokens == 4 and out[1].n_rare == 1
    assert out[2].n_tokens == 3 and out[2].n_rare == 2
    assert out[3].n_tokens == 4 and out[3].n_rare == 0
    assert out[2].rare_permille == 666  # floor(2000/3)


def test_rare_token_join_has_no_broadcast_hint(spark):
    """The term-count join must stay shuffle-side by default — the
    dictionary is unbounded at corpus scale (round-3 verdict's tfidf
    flag applies here too). AQE may still broadcast at runtime when the
    measured size fits; the assertion is about the LOGICAL hint."""
    from go_nonrat_annotation_pipeline_spark.operators.retrieval import (
        rare_token_stats,
    )
    from go_nonrat_annotation_pipeline_spark.sources.testdata import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    logical = rare_token_stats(docs)._jdf.queryExecution().logical().toString()
    assert "UnresolvedHint" not in logical and "hint" not in logical.lower()
