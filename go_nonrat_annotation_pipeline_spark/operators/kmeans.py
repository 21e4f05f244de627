"""Distributed Lloyd's k-means over an embedding column — the trainer
behind the IVF index (operators/similarity.ivf_topk currently samples
centroids; at 100 TB trained cells cut probe volume several-fold for
the same recall).

Spark-first shape per iteration:
- assignment is a map-side argmax against BROADCAST centroids (the
  corpus never shuffles);
- the update is ONE hash-aggregate shuffle keyed on the cell id:
  per-dimension sums via `F.aggregate`/`zip_with` element-wise array
  addition (JVM higher-order functions, no Python), count per cell,
  then mean = sum/count on the (k-row) driver-safe result.

Determinism: init picks the k vectors with the smallest md5(id) —
hash-stable under any partitioning, no RNG; ties in assignment break on
lower centroid id. Empty cells keep their previous centroid (standard
Lloyd's degeneracy handling, deterministic).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .dedup import _cosine_kernel, cosine


def _as_double(vec):
    return F.transform(vec, lambda x: x.cast("double"))


def kmeans_fit(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 16,
    max_iter: int = 10,
    early_stop: bool = True,
    assign_kernel: bool = False,
) -> DataFrame:
    """Train k cosine-metric centroids; returns (cent_id, cv) with cv a
    unit-normalized array<double>. Iterations: broadcast-assign +
    one-shuffle mean update; stops early when assignments are stable
    (same total movement check via centroid delta).

    ``early_stop=False`` runs exactly ``max_iter`` update steps — used by
    the oracle-checked registry query so the DuckDB mirror (which unrolls
    the iterations as chained CTEs and cannot express the data-dependent
    break) performs the identical number of updates. The stop check
    tolerates ~1e-9 centroid movement, so with it enabled the two engines
    could legitimately perform different update counts near convergence.

    ``assign_kernel=True`` scores the N×k assignment crossJoin with the
    Arrow numpy cosine kernel (one einsum per batch) instead of the
    interpreted higher-order-function expression — the scale setting for
    the trainer's hot loop (same switch as the LSH verify stage's
    verify_kernel). Assignment is an argmax over cosines, so the fitted
    centroids are bit-identical unless two cells tie to ~1e-15
    (tests/test_kmeans.py asserts kernel-vs-expression agreement);
    oracle-exact registry paths keep the default expression form.
    """
    vecs = df.select(
        F.col(id_col).alias("_id"), _as_double(F.col(vec_col)).alias("v")
    ).localCheckpoint()

    # deterministic seed: k hash-smallest vectors via orderBy().limit(k)
    # — TakeOrderedAndProject (per-partition heaps), NEVER a global
    # window (row_number with no partition funnels the corpus through
    # one task); the k seed rows are collected (tiny) and re-emitted
    # with dense cent_ids
    seed_rows = (
        vecs.orderBy(F.md5(F.col("_id").cast("string")), F.col("_id"))
        .limit(k)
        .collect()
    )
    spark = df.sparkSession
    cents = spark.createDataFrame(
        [(i, list(r.v)) for i, r in enumerate(seed_rows)],
        "cent_id int, cv array<double>",
    ).localCheckpoint()

    norm = lambda c: F.transform(  # noqa: E731
        c,
        lambda x: x
        / F.sqrt(F.aggregate(c, F.lit(0.0), lambda a, y: a + y * y)),
    )

    cos_fn = _cosine_kernel() if assign_kernel else cosine

    for _ in range(max_iter):
        scored = vecs.crossJoin(F.broadcast(cents)).withColumn(
            "_cos", cos_fn(F.col("v"), F.col("cv"))
        )
        ww = Window.partitionBy("_id").orderBy(F.desc("_cos"), F.asc("cent_id"))
        assigned = (
            scored.withColumn("_rn", F.row_number().over(ww))
            .where(F.col("_rn") == 1)
            .select("_id", "v", "cent_id")
        )
        # update via per-DIMENSION partial sums: posexplode to
        # (cell, dim, x) and sum with map-side combine — never gathers a
        # cell's vectors on one task (a collect_list per cell would:
        # cells are O(N/k) rows). Reduce output is k×dim rows — tiny.
        dim_sums = (
            assigned.select("cent_id", F.posexplode("v").alias("d", "x"))
            .groupBy("cent_id", "d")
            .agg(F.sum("x").alias("s"))
        )
        counts = assigned.groupBy("cent_id").agg(F.count(F.lit(1)).alias("n"))
        means = (
            dim_sums.join(counts, "cent_id")
            .groupBy("cent_id")
            .agg(
                F.array_sort(
                    F.collect_list(F.struct("d", (F.col("s") / F.col("n")).alias("m")))
                ).alias("dm")
            )
            .select(
                "cent_id", F.transform("dm", lambda e: e["m"]).alias("mean")
            )
        )
        new_cents = means.select("cent_id", norm(F.col("mean")).alias("cv"))
        # empty cells: keep the previous centroid
        kept = cents.join(new_cents.select("cent_id"), "cent_id", "left_anti")
        cents2 = new_cents.unionByName(kept).localCheckpoint()
        if early_stop:
            moved = (
                cents.select("cent_id", F.col("cv").alias("old"))
                .join(cents2, "cent_id")
                .where(F.round(cosine(F.col("old"), F.col("cv")), 9) < 1.0)
                .isEmpty()
            )
            cents = cents2
            if moved:
                break
        else:
            cents = cents2
    return cents


def kmeans_inertia(
    df: DataFrame,
    cents: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> float:
    """Mean (1 - best cosine) over the corpus — the cosine-metric
    inertia; lower is tighter."""
    vecs = df.select(
        F.col(id_col).alias("_id"), _as_double(F.col(vec_col)).alias("v")
    )
    scored = vecs.crossJoin(F.broadcast(cents)).withColumn(
        "_cos", cosine(F.col("v"), F.col("cv"))
    )
    best = scored.groupBy("_id").agg(F.max("_cos").alias("bc"))
    return best.agg(F.avg(F.lit(1.0) - F.col("bc"))).collect()[0][0]
