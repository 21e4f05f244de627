"""Similarity search over embedding columns (north-star extensions).

- brute-force cosine top-k: the exact baseline (query-set × corpus join,
  window top-k). At 100 TB the query side is small and broadcast; the
  corpus scan stays partition-parallel with map-side JVM vector math.
- LSH-bucketed ANN: deterministic random-hyperplane signatures; the
  candidate join collapses the corpus to matching buckets (shuffle on
  the bucket key), trading recall for a ~2^bits reduction in pairs.
  An IVF variant would swap the hash for k-means cells; the plumbing
  (bucket column + co-partitioned join) is identical.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .dedup import _cosine_kernel, cosine

LSH_MULT = 2654435761  # Knuth multiplicative constant
LSH_MOD = 2_147_483_647


def _hyperplane_weight(j: int, d: int) -> float:
    """Deterministic pseudo-random weight in (-0.5, 0.5) for plane j, dim d."""
    return ((j * 64 + d) * LSH_MULT % LSH_MOD) / LSH_MOD - 0.5


def hyperplane_bucket(
    v: Column, n_planes: int = 8, dim: int = 64, plane_offset: int = 0
) -> Column:
    """Sign-of-projection LSH bucket id (0 .. 2^n_planes-1).

    plane_offset selects a disjoint plane family — table t of a
    multi-table (OR-amplified) index uses offset t*n_planes.
    """
    bucket = None
    for j in range(n_planes):
        proj = sum(
            F.element_at(v, d + 1) * F.lit(_hyperplane_weight(plane_offset + j, d))
            for d in range(dim)
        )
        bit = F.when(proj > 0, F.lit(1 << j).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        bucket = bit if bucket is None else bucket + bit
    return bucket


def sql_hyperplane_bucket(
    v_expr: str, n_planes: int = 8, dim: int = 64, plane_offset: int = 0
) -> str:
    """DuckDB SQL mirror of hyperplane_bucket (same constants)."""
    parts = []
    for j in range(n_planes):
        proj = " + ".join(
            f"LIST_EXTRACT({v_expr}, {d + 1}) * ({_hyperplane_weight(plane_offset + j, d)!r})"
            for d in range(dim)
        )
        parts.append(f"CASE WHEN ({proj}) > 0 THEN CAST({1 << j} AS BIGINT) ELSE 0 END")
    return "(" + " + ".join(parts) + ")"


def _as_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def brute_force_topk(
    df: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
) -> DataFrame:
    """Exact top-k neighbors per query vector by cosine.

    Deterministic ranking: (round(cos,6) desc, neighbor id asc).
    """
    corpus = df.select(
        F.col(id_col).alias("neighbor_id"), _as_double(F.col(vec_col)).alias("vc")
    )
    qs = queries.select(
        F.col(id_col).alias("query_id"), _as_double(F.col(vec_col)).alias("vq")
    )
    scored = (
        F.broadcast(qs)
        .crossJoin(corpus)
        .where(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cosine", F.round(cosine(F.col("vq"), F.col("vc")), 6))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def argmax_cell(
    vec_col: Column,
    cent_rows: list[tuple[int, list[float]]],
    assign_kernel: bool = False,
) -> Column:
    """Nearest-centroid id by cosine as a PURE MAP-SIDE column — the
    k centroids are collected driver-side (k × dim floats, tiny by
    contract) and folded into the expression, so assignment shuffles
    NOTHING. This replaces the crossJoin + Window.partitionBy(id) form,
    whose window exchange moved all N×k scored rows per call — the
    actual bottleneck the 20× scale probe measured in the trainer loop.

    Tie-break matches the previous row_number ordering: higher cosine
    first, then lower centroid id (struct max on (cos, -cent_id)).

    assign_kernel=True swaps the k interpreted higher-order-function
    cosines per row for ONE Arrow numpy matmul per batch against the
    unit-normalized centroid matrix — same argmax unless two cells tie
    at float precision (tests/test_kmeans.py asserts agreement). The
    expression form suits k ≲ 64 (the Column tree grows ~70 nodes per
    centroid); use the kernel beyond that.
    """
    if assign_kernel:
        from pyspark.sql.pandas.functions import pandas_udf

        rows = sorted(cent_rows)  # cent_id asc → first-max = lowest id
        ids = np.asarray([int(c) for c, _ in rows], dtype=np.int64)
        C = np.asarray([np.asarray(v, dtype=np.float64) for _, v in rows])
        Cn = (C / np.linalg.norm(C, axis=1, keepdims=True)).T  # (dim, k)

        @pandas_udf("long")
        def cell(v: pd.Series) -> pd.Series:
            m = np.asarray([np.asarray(x, dtype=np.float64) for x in v])
            if len(m) == 0:
                return pd.Series([], dtype="int64")
            # |v| is constant across one row's candidates, so argmax of
            # v·(c/|c|) equals argmax of cosine
            return pd.Series(ids[np.argmax(m @ Cn, axis=1)])

        return cell(vec_col)

    # Expression form, built with O(1) higher-order lambdas TOTAL (not
    # per centroid): the centroids go in as ONE nested array literal and
    # a transform over their indices scores each. Per-centroid cosine()
    # calls would construct ~4 py4j lambda trees each (~1.2s of driver
    # time at k=16 per invocation). Centroid norms are precomputed
    # driver-side with the same left-to-right IEEE summation as the
    # F.aggregate fold, so the arithmetic — dot / (|v| * |c|) — stays
    # bit-identical to operators/dedup.cosine and the DuckDB oracles.
    import math

    ids = [int(cid) for cid, _ in cent_rows]
    mats = [[float(x) for x in cv] for _, cv in cent_rows]

    def _seq_sumsq(xs: list[float]) -> float:
        acc = 0.0
        for x in xs:
            acc = acc + x * x
        return acc

    # literals rendered as ONE SQL string each — F.lit on a (nested)
    # list recurses into one py4j call per element (~1000 for k=16 ×
    # dim=64, ≈0.7s of driver time per invocation); repr() round-trips
    # doubles exactly, so the parsed literal is bit-identical
    def _arr_sql(xs) -> str:
        return "array(" + ",".join(f"{x!r}D" for x in xs) + ")"

    C = F.expr(
        "array(" + ",".join(_arr_sql(cv) for cv in mats) + ")"
    )
    cnorms = F.expr(_arr_sql(math.sqrt(_seq_sumsq(cv)) for cv in mats))
    negids = F.expr(_arr_sql(float(-i) for i in ids))

    vnorm = F.sqrt(
        F.aggregate(vec_col, F.lit(0.0), lambda a, x: a + x * x)
    )
    scored = F.transform(
        F.sequence(F.lit(1), F.lit(len(ids))),
        lambda i: F.struct(
            (
                F.aggregate(
                    F.zip_with(
                        vec_col, F.element_at(C, i), lambda x, y: x * y
                    ),
                    F.lit(0.0),
                    lambda a, x: a + x,
                )
                / (vnorm * F.element_at(cnorms, i))
            ).alias("c"),
            F.element_at(negids, i).alias("n"),
        ),
    )
    return (-F.array_max(scored)["n"]).cast("long")


def ivf_assign(
    df: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "v",
    cent_id: str = "cent_id",
    cent_vec: str = "cv",
    assign_kernel: bool = False,
) -> DataFrame:
    """Assign every vector to its nearest centroid by cosine (IVF cells).

    The centroid table is dimension-sized by contract, so it is collected
    driver-side and folded into a map-side argmax column (argmax_cell) —
    the corpus never shuffles and no window exchange exists. Deterministic
    tie-break: higher cosine first, then lower centroid id.

    assign_kernel=True uses the Arrow matmul kernel per batch (scale
    setting — same switch as verify_kernel / kmeans_fit's assign_kernel);
    the default expression form is what the DuckDB oracles reproduce
    bit-for-bit.
    """
    cent_rows = [
        (r[0], list(r[1]))
        for r in centroids.select(cent_id, cent_vec).collect()
    ]
    return df.select(
        id_col,
        vec_col,
        argmax_cell(F.col(vec_col), cent_rows, assign_kernel).alias("cell"),
    )


def ivf_topk(
    df: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_centroids: int = 16,
    n_probe: int = 2,
    centroids: DataFrame | None = None,
    assign_kernel: bool = False,
) -> DataFrame:
    """IVF approximate top-k: partition the corpus into centroid cells,
    probe only the n_probe cells nearest each query.

    The scale path alongside LSH banding (hyperplane_bucket): default
    centroids are a deterministic corpus sample (vec_id < n_centroids)
    so the oracle reproduces the index exactly; pass
    ``centroids=(cent_id, cv)`` — e.g. from operators/kmeans.kmeans_fit
    — for trained cells (tighter cells ⇒ better recall per probe). The
    plumbing is identical: broadcast centroids, map-side assignment,
    one equi-join on the cell key.
    """
    corpus = df.select(
        F.col(id_col).alias("neighbor_id"), _as_double(F.col(vec_col)).alias("vc")
    )
    cents = (
        centroids
        if centroids is not None
        else df.where(F.col(id_col) < n_centroids).select(
            F.col(id_col).alias("cent_id"), _as_double(F.col(vec_col)).alias("cv")
        )
    )
    assigned = ivf_assign(
        corpus, cents, "neighbor_id", "vc", assign_kernel=assign_kernel
    )

    qs = queries.select(
        F.col(id_col).alias("query_id"), _as_double(F.col(vec_col)).alias("vq")
    )
    qscored = qs.crossJoin(F.broadcast(cents)).withColumn(
        "_cos", cosine(F.col("vq"), F.col("cv"))
    )
    wq = Window.partitionBy("query_id").orderBy(F.desc("_cos"), F.asc("cent_id"))
    probes = (
        qscored.withColumn("_rn", F.row_number().over(wq))
        .where(F.col("_rn") <= n_probe)
        .select("query_id", "vq", F.col("cent_id").alias("cell"))
    )

    scored = (
        F.broadcast(probes)
        .join(assigned, "cell")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cosine", F.round(cosine(F.col("vq"), F.col("vc")), 6))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def lsh_ann_topk(
    df: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_planes: int = 4,
    dim: int = 64,
) -> DataFrame:
    """Approximate top-k: compare only within the query's LSH bucket.

    Buckets come from the Arrow matmul kernel (n_tables=1) rather than
    the expression-form hyperplane_bucket: the Column-tree form costs
    O(n_planes×dim) nodes per side (~256 at 4×64 — py4j construction
    time and interpreted evaluation past the codegen limit), while the
    kernel is one numpy matmul per Arrow batch. hyperplane_bucket stays
    exported for small-dim inline use (its SQL mirror defines the oracle).
    """
    bucket_udf = _multitable_bucket_udf(n_planes, 1, dim)
    corpus = df.select(
        F.col(id_col).alias("neighbor_id"), _as_double(F.col(vec_col)).alias("vc")
    ).withColumn("bucket", F.element_at(bucket_udf(F.col("vc")), 1))
    qs = queries.select(
        F.col(id_col).alias("query_id"), _as_double(F.col(vec_col)).alias("vq")
    ).withColumn("bucket", F.element_at(bucket_udf(F.col("vq")), 1))
    scored = (
        F.broadcast(qs)
        .join(corpus, "bucket")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cosine", F.round(cosine(F.col("vq"), F.col("vc")), 6))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "bucket", "neighbor_id", "cosine", "rank")
    )


def _multitable_bucket_udf(n_planes: int, n_tables: int, dim: int):
    """Arrow-batched kernel computing all n_tables bucket ids at once.

    The expression form of one bucket is an O(n_planes*dim)-node Column
    tree; at 8 tables x 4 planes x 64 dims that is ~2000 nodes PER SIDE
    — tens of seconds of py4j tree construction and an interpreted
    (codegen-overflow) evaluation. One numpy matmul per Arrow batch
    ((batch x dim) @ (dim x planes)) replaces all of it; this is the
    sanctioned Python path: vectorized, no per-row Python.

    Sign-of-projection is float-order sensitive in principle (numpy sums
    pairwise, SQL sums sequentially) but weights are O(0.1) and
    projections O(1), so a sign flip needs |proj| ~ 1e-15 — negligible,
    and the DuckDB oracle cross-checks it every round.
    """
    from pyspark.sql.pandas.functions import pandas_udf
    from pyspark.sql.types import ArrayType, LongType

    w = np.array(
        [
            [_hyperplane_weight(t * n_planes + j, d) for d in range(dim)]
            for t in range(n_tables)
            for j in range(n_planes)
        ]
    ).T  # (dim, n_tables*n_planes)
    pow2 = 1 << np.arange(n_planes, dtype=np.int64)

    @pandas_udf(ArrayType(LongType()))
    def buckets(v: pd.Series) -> pd.Series:
        mat = np.asarray([np.asarray(x, dtype=np.float64) for x in v])
        bits = (mat @ w) > 0  # (batch, n_tables*n_planes)
        per_table = bits.reshape(len(mat), n_tables, n_planes) @ pow2
        return pd.Series(list(per_table))

    return buckets


def lsh_multitable_topk(
    df: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_planes: int = 4,
    n_tables: int = 8,
    dim: int = 64,
) -> DataFrame:
    """OR-amplified LSH ANN: a candidate matches if it shares a bucket
    with the query in ANY of n_tables independent hash tables.

    The standard recall booster for sign-random-projection LSH (recall
    per table compounds as 1-(1-p)^L). Scale shape: each side maps to
    n_tables (table, bucket) keys via a generated-column explode — a
    map-side n_tables× expansion, no shuffle — then one equi-join on
    the composite key; candidate pairs dedupe before the (expensive)
    exact re-score, so each survivor is scored once.
    """
    corpus = df.select(
        F.col(id_col).alias("neighbor_id"), _as_double(F.col(vec_col)).alias("vc")
    )
    qs = queries.select(
        F.col(id_col).alias("query_id"), _as_double(F.col(vec_col)).alias("vq")
    )

    bucket_udf = _multitable_bucket_udf(n_planes, n_tables, dim)

    def keyed(frame: DataFrame, v: str) -> DataFrame:
        # posexplode emits (table_index, bucket) — the composite join key
        cols = [c for c in frame.columns]
        return (
            frame.select(
                *cols, F.posexplode(bucket_udf(F.col(v))).alias("_t", "_b")
            )
            .withColumn(
                "tb", F.struct(F.col("_t").alias("t"), F.col("_b").alias("b"))
            )
            .drop("_t", "_b")
        )

    cand = (
        F.broadcast(keyed(qs, "vq"))
        .join(keyed(corpus, "vc"), "tb")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "vq", "neighbor_id", "vc")
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    scored = cand.withColumn("cosine", F.round(cosine(F.col("vq"), F.col("vc")), 6))
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )
