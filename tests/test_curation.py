"""Curation operators (operators/sampling): leakage-safety of the
cluster-keyed split and exactness of n-gram contamination detection."""

from __future__ import annotations

from pyspark.sql import functions as F

from go_nonrat_annotation_pipeline_spark.operators.sampling import (
    cluster_safe_split,
    contamination_pairs,
)


def test_cluster_safe_split_never_splits_a_cluster(spark):
    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(200)], "doc_id long, text string"
    )
    # clusters: docs 0-9 in cluster 0, 10-19 in cluster 10, rest singletons
    clusters = spark.createDataFrame(
        [(i, (i // 10) * 10) for i in range(20)],
        "doc_id long, cluster_id long",
    )
    out = cluster_safe_split(docs, clusters, "doc_id", "cc")
    # every cluster maps to exactly one split
    straddlers = (
        out.groupBy("cluster_id")
        .agg(F.count_distinct("split").alias("n"))
        .where(F.col("n") > 1)
    )
    assert straddlers.isEmpty()
    # clustered docs inherit the CLUSTER id's gate, not their own
    by_doc = {r.doc_id: r.split for r in out.collect()}
    assert len({by_doc[i] for i in range(10)}) == 1
    assert len({by_doc[i] for i in range(10, 20)}) == 1
    # both splits non-empty over 200 docs at an ~80/20 gate
    assert {r.split for r in out.select("split").distinct().collect()} == {
        "train",
        "test",
    }


def test_contamination_exact_ngram_only(spark):
    shared = " ".join(f"w{i}" for i in range(13))      # exact 13-gram
    near = " ".join(f"w{i}" for i in range(12))        # only 12 shared
    train = spark.createDataFrame(
        [
            (1, f"prefix {shared} suffix"),
            (2, f"other {near} tail words here beyond"),
            (3, "completely unrelated text with many distinct words"),
        ],
        "doc_id long, text string",
    )
    test = spark.createDataFrame(
        [(100, f"intro {shared} outro")], "doc_id long, text string"
    )
    got = {
        (r.train_id, r.test_id): r.shared
        for r in contamination_pairs(train, test, n=13).collect()
    }
    assert (1, 100) in got and got[(1, 100)] >= 1
    assert (2, 100) not in got  # 12-word overlap is NOT contamination
    assert (3, 100) not in got


# ---------------------------------------------------------------------------
# PPS systematic sampling
# ---------------------------------------------------------------------------
def test_pps_sample_invariants(spark):
    from pyspark.sql import functions as F

    from go_nonrat_annotation_pipeline_spark.operators.sampling import (
        pps_systematic_sample,
    )
    from go_nonrat_annotation_pipeline_spark.sources.testdata import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    step = 500
    out = pps_systematic_sample(docs, F.col("n_chars"), step=step)
    rows = out.collect()
    total = docs.agg(F.sum("n_chars")).first()[0]
    # total hits = number of step boundaries crossed by the full mass
    assert sum(r.n_hits for r in rows) == total // step
    # rows at least as heavy as the step are always selected
    heavy = {r.doc_id for r in docs.where(F.col("n_chars") >= step).collect()}
    got = {r.doc_id for r in rows}
    assert heavy <= got
    # partitioning-invariant (the window defines one global order)
    out2 = pps_systematic_sample(
        docs.repartition(7), F.col("n_chars"), step=step
    )
    assert sorted(tuple(r) for r in out2.collect()) == sorted(
        tuple(r) for r in rows
    )
