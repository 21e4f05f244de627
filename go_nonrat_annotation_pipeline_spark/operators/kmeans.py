"""Distributed Lloyd's k-means over an embedding column — the trainer
behind the IVF index (operators/similarity.ivf_topk currently samples
centroids; at 100 TB trained cells cut probe volume several-fold for
the same recall).

Spark-first shape per iteration:
- assignment is a map-side argmax with the k centroids collected
  driver-side and folded into the column (operators/similarity.
  argmax_cell) — the corpus never shuffles and there is NO window
  exchange;
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

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import cosine
from .similarity import argmax_cell


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

    ``assign_kernel=True`` swaps the per-row k interpreted cosine folds
    for ONE Arrow numpy matmul per batch (argmax_cell's kernel form) —
    the scale setting for the trainer's hot loop (same switch as the LSH
    verify stage's verify_kernel). Assignment is an argmax over cosines,
    so the fitted centroids are bit-identical unless two cells tie at
    float precision (tests/test_kmeans.py asserts kernel-vs-expression
    agreement); oracle-exact registry paths keep the default expression
    form.
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

    for _ in range(max_iter):
        # assignment is a PURE MAP-SIDE argmax: the k centroids (tiny)
        # are collected and folded into the column via argmax_cell — no
        # crossJoin, no window exchange. The previous crossJoin +
        # row_number form shuffled all N×k scored rows per iteration.
        # The narrow result is persisted so the two update branches
        # (per-dimension sums + cell counts) share ONE evaluation — the
        # old window form got that sharing implicitly via ReusedExchange.
        cent_rows = [(r.cent_id, list(r.cv)) for r in cents.collect()]
        assigned = vecs.select(
            "_id",
            "v",
            argmax_cell(F.col("v"), cent_rows, assign_kernel)
            .cast("int")
            .alias("cent_id"),
        ).persist()
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
        assigned.unpersist()
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
