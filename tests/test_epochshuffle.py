"""Epoch shuffle layout (operators/epochshuffle.py): each epoch's
(shard, rank) is a full permutation, epochs decorrelate, the layout is
reproducible, and the window never goes global."""

from __future__ import annotations

from pyspark.sql import functions as F

from go_nonrat_annotation_pipeline_spark.operators import epochshuffle as ES

N = 4000
SHARDS = 16


def _docs(spark):
    return spark.range(N).select(F.col("id").alias("doc_id"))


def test_gpos_is_a_full_permutation(spark):
    g = ES.global_positions(ES.epoch_layout(_docs(spark), 0, SHARDS))
    row = g.agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("gpos").alias("d"),
        F.min("gpos").alias("lo"),
        F.max("gpos").alias("hi"),
    ).collect()[0]
    assert (row.n, row.d, row.lo, row.hi) == (N, N, 1, N)


def test_epochs_decorrelate(spark):
    docs = _docs(spark)
    g0 = ES.global_positions(ES.epoch_layout(docs, 0, SHARDS)).withColumnRenamed("gpos", "g0")
    g1 = ES.global_positions(ES.epoch_layout(docs, 1, SHARDS)).withColumnRenamed("gpos", "g1")
    j = g0.join(g1, "doc_id")
    row = j.agg(
        F.sum(F.when(F.col("g0") == F.col("g1"), 1).otherwise(0)).alias("fixed"),
        F.sum(F.abs(F.col("g0") - F.col("g1"))).alias("disp"),
    ).collect()[0]
    assert row.fixed < N * 0.01  # ~1/N expected fixed points
    # uniform-permutation expected displacement ~ N/3 per doc
    assert abs(row.disp / N - N / 3) < N * 0.05


def test_reproducible(spark):
    docs = _docs(spark)
    a = {(r.doc_id, r.shard, r.rank) for r in ES.epoch_layout(docs, 3, SHARDS).collect()}
    b = {(r.doc_id, r.shard, r.rank) for r in ES.epoch_layout(docs, 3, SHARDS).collect()}
    assert a == b


def test_no_global_window(spark):
    """The rank window must be partitioned by shard — a global-order
    window would single-task the corpus."""
    plan = ES.epoch_layout(_docs(spark), 0, SHARDS)._jdf.queryExecution(
    ).executedPlan().toString()
    assert "hashpartitioning(shard" in plan
    assert "SinglePartition" not in plan
