"""Leakage-safe splitting (operators/splitting.py): cluster-keyed
assignment provably never splits a duplicate family, the naive twin
does, percentages land where configured, and the salt re-rolls."""

from __future__ import annotations

from pyspark.sql import functions as F

from go_nonrat_annotation_pipeline_spark.operators import splitting as SP


def _corpus(spark, n=2000, fam=5):
    # fam docs per family -> cluster key is the family id
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % (n // fam)).alias("family"),
    )


def test_cluster_keyed_split_never_leaks(spark):
    a = SP.assign_splits(_corpus(spark), F.col("family"))
    assert SP.leaky_clusters(a).count() == 0


def test_naive_split_leaks_on_families(spark):
    docs = _corpus(spark)
    naive = docs.withColumn("cluster", F.col("family")).withColumn(
        "split", SP.split_of(F.col("doc_id"), "split0")
    )
    assert SP.leaky_clusters(naive).count() > 0


def test_split_fractions_near_configured(spark):
    a = SP.assign_splits(_corpus(spark, 20000, 1), F.col("doc_id"))
    n = {r.split: r.cnt for r in a.groupBy("split").agg(
        F.count(F.lit(1)).alias("cnt")).collect()}
    total = sum(n.values())
    assert abs(n["train"] / total - 0.80) < 0.02
    assert abs(n["val"] / total - 0.10) < 0.02
    assert abs(n["test"] / total - 0.10) < 0.02


def test_salt_rerolls_membership(spark):
    docs = _corpus(spark, 5000, 1)
    a = SP.assign_splits(docs, F.col("doc_id"), salt="split0")
    b = SP.assign_splits(docs, F.col("doc_id"), salt="split1")
    moved = (
        a.select("doc_id", F.col("split").alias("s0"))
        .join(b.select("doc_id", F.col("split").alias("s1")), "doc_id")
        .where("s0 != s1")
        .count()
    )
    assert moved > 1000  # a salt bump re-rolls, not perturbs


def test_assignment_is_map_only(spark):
    """Zero exchanges in the assignment plan — the 100 TB contract."""
    a = SP.assign_splits(_corpus(spark), F.col("family"))
    plan = a._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
