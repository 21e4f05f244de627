from __future__ import annotations

from pyspark.sql import functions as F

from go_nonrat_annotation_pipeline_spark.operators import ppjoin as PJ
from go_nonrat_annotation_pipeline_spark.operators.dedup import shingle_sets

SF = "/root/testdata/sf0.001"


def _docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


def _brute_pairs(spark, docs, t_ppm):
    """Recall oracle: full quadratic shingle-set Jaccard."""
    sh = shingle_sets(docs.select("doc_id", "text"), "text").where(
        F.size("sh") > 0
    )
    a = sh.select(F.col("doc_id").alias("id_a"), F.col("sh").alias("sa"))
    b = sh.select(F.col("doc_id").alias("id_b"), F.col("sh").alias("sb"))
    inter = F.size(F.array_intersect("sa", "sb")).cast("long")
    uni = (F.size("sa") + F.size("sb")).cast("long") - inter
    return (
        a.crossJoin(b)
        .where(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.expr(f"CAST(size(array_intersect(sa, sb)) * {PJ.PPM} DIV "
                   f"(size(sa) + size(sb) - size(array_intersect(sa, sb)))"
                   f" AS BIGINT)").alias("jac_ppm"),
        )
        .where(F.col("jac_ppm") >= t_ppm)
    )


def test_exact_vs_bruteforce(spark):
    docs = _docs(spark).limit(150)
    got = {
        (r.id_a, r.id_b, r.jac_ppm)
        for r in PJ.similarity_join(docs, 600_000).collect()
    }
    want = {
        (r.id_a, r.id_b, r.jac_ppm)
        for r in _brute_pairs(spark, docs, 600_000).collect()
    }
    # prefix filtering is EXACT: identical pair set and scores
    assert got == want and len(want) > 0


def test_candidates_prune_quadratic(spark):
    docs = _docs(spark)
    n = docs.count()
    pref = PJ.prefix_tokens(docs, 600_000)
    a = pref.select(F.col("doc_id").alias("id_a"), "token")
    b = pref.select(F.col("doc_id").alias("id_b"), "token")
    cands = (
        a.join(b, "token")
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
        .count()
    )
    # the funnel: far fewer candidates than n*(n-1)/2
    assert cands < (n * (n - 1) // 2) * 0.01


def test_higher_threshold_shrinks_prefix_and_pairs(spark):
    docs = _docs(spark)
    p60 = PJ.prefix_tokens(docs, 600_000).count()
    p85 = PJ.prefix_tokens(docs, 850_000).count()
    assert p85 < p60
    j60 = PJ.similarity_join(docs, 600_000)
    j85 = PJ.similarity_join(docs, 850_000)
    s60 = {(r.id_a, r.id_b) for r in j60.collect()}
    s85 = {(r.id_a, r.id_b) for r in j85.collect()}
    assert s85 <= s60
    # scores are threshold-independent where pairs overlap
    m60 = {(r.id_a, r.id_b): r.jac_ppm for r in j60.collect()}
    for r in j85.collect():
        assert m60[(r.id_a, r.id_b)] == r.jac_ppm
