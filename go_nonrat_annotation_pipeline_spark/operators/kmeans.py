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

import math
from decimal import ROUND_HALF_UP, Decimal

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import cosine
from .similarity import argmax_cell


def _as_double(vec):
    return F.transform(vec, lambda x: x.cast("double"))


def _round9_cosine_lt1(a: list[float], b: list[float]) -> bool:
    """Driver mirror of the old JVM early-stop predicate
    ``F.round(cosine(old, new), 9) < 1.0`` — same left-to-right IEEE
    folds as operators/dedup.cosine, same HALF_UP decimal rounding
    (Spark rounds DoubleType via the shortest-repr decimal string,
    which is what ``repr(float)`` yields)."""
    dot = 0.0
    for x, y in zip(a, b):
        dot = dot + x * y
    na = 0.0
    for x in a:
        na = na + x * x
    nb = 0.0
    for y in b:
        nb = nb + y * y
    den = math.sqrt(na) * math.sqrt(nb)
    if den == 0.0:
        # IEEE division the JVM expression performed: 0/0 -> NaN,
        # ±x/0 -> ±Inf (Python float / raises instead — ADVICE r13)
        c = float("nan") if dot == 0.0 else math.copysign(
            float("inf"), dot
        )
    else:
        c = dot / den
    if math.isnan(c):
        # JVM: round(NaN, 9) < 1.0 is simply FALSE; Decimal('nan')
        # .quantize would raise InvalidOperation (ADVICE r13)
        return False
    if math.isinf(c):
        # JVM: round(±Inf, 9) = ±Inf; -Inf < 1.0 is true
        return c < 1.0
    return Decimal(repr(c)).quantize(
        Decimal("1e-9"), rounding=ROUND_HALF_UP
    ) < Decimal(1)


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
    cent_rows: list[tuple[int, list[float]]] = [
        (i, [float(x) for x in r.v]) for i, r in enumerate(seed_rows)
    ]

    for _ in range(max_iter):
        # assignment is a PURE MAP-SIDE argmax: the k centroids (tiny)
        # live driver-side and are folded into the column via
        # argmax_cell — no crossJoin, no window exchange. The previous
        # crossJoin + row_number form shuffled all N×k scored rows per
        # iteration.
        #
        # update via per-DIMENSION partial sums: posexplode to
        # (cell, dim, x) and sum with map-side combine — never gathers a
        # cell's vectors on one task (a collect_list per cell would:
        # cells are O(N/k) rows). Reduce output is k×dim rows — tiny,
        # so the mean + unit-normalization runs DRIVER-side on the
        # collected aggregate (r13 optimization: the whole update is ONE
        # action per iteration; the earlier JVM-side mean/norm/anti-join
        # + per-iteration localCheckpoint paid ~4 extra driver jobs and
        # a full plan re-analysis per iteration for k-row arithmetic).
        # Bit-exactness: the per-(cell,dim) F.sum is byte-identical to
        # the old plan; mean = s/n and x/sqrt(Σx²) (left-to-right fold)
        # are the same IEEE-double ops the old JVM expressions ran.
        sums = (
            vecs.select(
                argmax_cell(F.col("v"), cent_rows, assign_kernel)
                .cast("int")
                .alias("cent_id"),
                "v",
            )
            # separate select: a generator in the same projection as the
            # argmax struct expression makes the analyzer drop the
            # struct's field aliases (col1/col2), breaking array_max["n"]
            .select("cent_id", F.posexplode("v").alias("d", "x"))
            .groupBy("cent_id", "d")
            .agg(F.sum("x").alias("s"), F.count(F.lit(1)).alias("n"))
            .collect()
        )
        by_cell: dict[int, dict[int, tuple[float, int]]] = {}
        for r in sums:
            by_cell.setdefault(r.cent_id, {})[r.d] = (r.s, r.n)
        new_rows: list[tuple[int, list[float]]] = []
        moved = False
        for cid, cv in cent_rows:
            dims = by_cell.get(cid)
            if not dims:
                # empty cell: keep the previous centroid
                new_rows.append((cid, cv))
                continue
            mean = [dims[d][0] / dims[d][1] for d in range(len(cv))]
            acc = 0.0
            for m in mean:
                acc = acc + m * m
            nrm = math.sqrt(acc)
            if nrm == 0.0:
                # IEEE division the replaced JVM expressions performed
                # on a zero-vector mean: 0/0 -> NaN, ±x/0 -> ±Inf —
                # Python float / would raise ZeroDivisionError and
                # crash a degenerate-but-previously-survivable fit
                # (ADVICE r13)
                new_cv = [
                    float("nan")
                    if m == 0.0
                    else math.copysign(float("inf"), m)
                    for m in mean
                ]
            else:
                new_cv = [m / nrm for m in mean]
            new_rows.append((cid, new_cv))
            if early_stop and not moved:
                moved = _round9_cosine_lt1(cv, new_cv)
        cent_rows = new_rows
        if early_stop and not moved:
            break
    return spark.createDataFrame(
        cent_rows, "cent_id int, cv array<double>"
    )


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
