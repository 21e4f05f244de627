"""Distributed k-means trainer (operators/kmeans): determinism, inertia
improvement over hash-sampled centroids, and separable-cluster recovery."""

from __future__ import annotations

from pyspark.sql import functions as F

from go_nonrat_annotation_pipeline_spark.operators.kmeans import (
    kmeans_fit,
    kmeans_inertia,
)
from go_nonrat_annotation_pipeline_spark.sources.testdata import load_table

SF = "/root/testdata/sf0.001"


def test_kmeans_recovers_separated_clusters(spark):
    # 3 well-separated direction clusters in 4-d
    import random

    rnd = random.Random(3)
    base = {0: [1, 0, 0, 0], 1: [0, 1, 0, 0], 2: [0, 0, 1, 0]}
    rows = []
    for i in range(300):
        c = i % 3
        rows.append(
            (i, [b + rnd.uniform(-0.05, 0.05) for b in base[c]], c)
        )
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>, label int")
    cents = kmeans_fit(df, k=3, max_iter=8)
    assert cents.count() == 3
    # every point's nearest trained centroid is shared by its whole label
    from go_nonrat_annotation_pipeline_spark.operators.similarity import ivf_assign

    v = df.select("vec_id", F.col("embedding").alias("v"), "label")
    assigned = ivf_assign(v, cents, "vec_id", "v").join(
        df.select("vec_id", "label"), "vec_id"
    )
    purity = (
        assigned.groupBy("label")
        .agg(F.count_distinct("cell").alias("cells"))
        .agg(F.max("cells"))
        .collect()[0][0]
    )
    assert purity == 1  # each true cluster maps to exactly one cell


def test_kmeans_deterministic_and_improves_inertia(spark):
    emb = load_table(spark, SF, "embeddings")
    c1 = kmeans_fit(emb, k=8, max_iter=4)
    c2 = kmeans_fit(emb, k=8, max_iter=4)
    a = sorted(map(tuple, ((r.cent_id, tuple(round(x, 9) for x in r.cv)) for r in c1.collect())))
    b = sorted(map(tuple, ((r.cent_id, tuple(round(x, 9) for x in r.cv)) for r in c2.collect())))
    assert a == b  # bit-stable across runs

    # trained centroids beat the raw hash-sampled seed on inertia
    seed = kmeans_fit(emb, k=8, max_iter=1)
    trained = kmeans_inertia(emb, c1)
    seeded = kmeans_inertia(emb, seed)
    assert trained <= seeded + 1e-9


def test_assign_kernel_agrees_with_expression(spark):
    """The Arrow cosine kernel (assign_kernel=True, the scale setting)
    must fit the SAME centroids as the oracle-exact expression form:
    assignment is an argmax over cosines, so ULP-level kernel-vs-fold
    differences only matter on ~1e-15 cell ties (none in this corpus)."""
    emb = load_table(spark, SF, "embeddings")
    expr = kmeans_fit(emb, k=8, max_iter=4, early_stop=False)
    kern = kmeans_fit(emb, k=8, max_iter=4, early_stop=False, assign_kernel=True)
    a = sorted((r.cent_id, tuple(round(x, 12) for x in r.cv)) for r in expr.collect())
    b = sorted((r.cent_id, tuple(round(x, 12) for x in r.cv)) for r in kern.collect())
    assert a == b

    # and the IVF cell assignment agrees pointwise
    from go_nonrat_annotation_pipeline_spark.operators.similarity import ivf_assign

    v = emb.select("vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("v"))
    c_expr = {r.vec_id: r.cell for r in ivf_assign(v, expr, "vec_id", "v").collect()}
    c_kern = {
        r.vec_id: r.cell
        for r in ivf_assign(v, expr, "vec_id", "v", assign_kernel=True).collect()
    }
    assert c_expr == c_kern
