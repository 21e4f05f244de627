"""Priority sampling (operators/sampling_priority.py): heavy items are
certain, estimators are near-unbiased over repeated salts, small
populations pass through exactly."""

from __future__ import annotations

from pyspark.sql import functions as F

from go_nonrat_annotation_pipeline_spark.operators import (
    sampling_priority as PR,
)


def _pop(spark, n=5000, heavy=3):
    # a few massive weights among many small ones
    return spark.range(n).select(
        F.col("id").alias("k"),
        F.when(F.col("id") < heavy, F.lit(1_000_000))
        .otherwise((F.col("id") % 9) + 1)
        .alias("w_in"),
    )


def test_heavy_items_always_sampled(spark):
    pop = _pop(spark)
    s = PR.priority_sample(
        pop, F.col("w_in"), F.col("k"), 100, order_cols=["k"]
    )
    got = {r.k for r in s.collect()}
    assert {0, 1, 2} <= got  # w >= tau => certainty (DLT theorem 1)


def test_small_population_passes_through_exact(spark):
    pop = _pop(spark, n=50, heavy=0)
    s = PR.priority_sample(
        pop, F.col("w_in"), F.col("k"), 100, order_cols=["k"]
    ).collect()
    assert len(s) == 50
    assert all(r.w_est == r.w for r in s)  # tau = 0: the sample is exact


def test_estimator_near_unbiased_across_salts(spark):
    pop = _pop(spark, n=4000, heavy=2).localCheckpoint()
    total = pop.agg(F.sum("w_in")).collect()[0][0]
    ests = []
    for i in range(12):
        s = PR.priority_sample(
            pop, F.col("w_in"), F.col("k"), 150,
            salt=f"prio{i}", order_cols=["k"],
        )
        ests.append(s.agg(F.sum("w_est")).collect()[0][0])
    mean = sum(ests) / len(ests)
    assert abs(mean - total) / total < 0.10


def test_deterministic_per_salt(spark):
    pop = _pop(spark)
    a = {(r.k, r.priority) for r in PR.priority_sample(
        pop, F.col("w_in"), F.col("k"), 100, order_cols=["k"]).collect()}
    b = {(r.k, r.priority) for r in PR.priority_sample(
        pop, F.col("w_in"), F.col("k"), 100, order_cols=["k"]).collect()}
    assert a == b
