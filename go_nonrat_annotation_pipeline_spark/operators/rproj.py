"""Signed random projection (Johnson-Lindenstrauss) for embeddings.

Dimensionality reduction is the standard pre-step before ANN at corpus
scale: a d→k signed random projection (entries ±1, Achlioptas 2001)
preserves pairwise inner products up to (1±ε) with k = O(log n / ε²),
shrinking both the shuffle payload of every downstream candidate join
and the per-comparison cost of brute-force verification.

Cross-engine exactness: floats never survive to the comparison
boundary. Input embeddings are quantized to BIGINT fixed-point
(floor(x·10⁶) — floor, not round: round-half ties differ per engine),
the projection matrix entries are ±1 derived from the repo's md5
char_hash (functions/hashing.py), and every projected coordinate is an
exact integer sum — bit-identical in Spark and DuckDB, no decimal
gymnastics. |q|≤~10⁶·‖emb‖∞ and d=64, so sums stay ≪ 2^63.

Spark-first shape (expression path): explode the quantized vector to
(vec_id, dim, q) rows once, broadcast-join the k·d-row sign matrix
(a driver-built literal — k·d ≤ a few thousand), and fold back with ONE
hash aggregate carrying k conditional sums. One shuffle, all
whole-stage-codegen. The Arrow path (`rproject_kernel`) does the same
contraction as an int64 matmul per Arrow batch — zero shuffles, the
100 TB shape — and must agree bit-for-bit with the expression path.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, functions as F

from ..functions.hashing import P
from .util import ensure_parallelism

Q_SCALE = 1_000_000  # fixed-point quantization scale
DEFAULT_K = 16       # projected dimensionality


def _sign(d: int, j: int) -> int:
    """±1 from the repo's md5 char_hash of 'rp|d|j' — reproduced here in
    pure Python (hashlib md5 == Spark F.md5 == DuckDB MD5 on ASCII)."""
    h = int(hashlib.md5(f"rp|{d}|{j}".encode()).hexdigest()[:15], 16) % P
    return 1 if h % 2 == 0 else -1


def sign_matrix(dim: int, k: int = DEFAULT_K) -> list[tuple[int, int, int]]:
    """(d, j, s) triples, d in 1..dim, j in 1..k (1-based, matching the
    1-based list indexing both engines use)."""
    return [
        (d, j, _sign(d, j))
        for d in range(1, dim + 1)
        for j in range(1, k + 1)
    ]


def quantize(emb_col) -> "F.Column":
    """array<float> → array<bigint> exact fixed-point (floor(x·10⁶))."""
    return F.transform(
        emb_col,
        lambda x: F.floor(x.cast("double") * Q_SCALE).cast("long"),
    )


def rproject(
    embs: DataFrame,
    dim: int,
    k: int = DEFAULT_K,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """(id, j, p): projected coordinate j (1..k) per vector, exact
    BIGINT. Long-form output — callers aggregate or pivot as needed
    (arrays are banned at the driver's comparison boundary)."""
    spark = embs.sparkSession
    signs = spark.createDataFrame(
        sign_matrix(dim, k), "d int, j int, s long"
    )
    q = ensure_parallelism(embs.select(id_col, emb_col)).select(
        id_col, quantize(F.col(emb_col)).alias("q")
    )
    exploded = q.select(
        id_col,
        F.posexplode("q").alias("d0", "x"),
    ).select(id_col, (F.col("d0") + 1).cast("int").alias("d"), "x")
    return (
        exploded.join(F.broadcast(signs), "d")
        .groupBy(id_col, "j")
        .agg(F.sum(F.col("x") * F.col("s")).alias("p"))
    )


def rproject_wide(
    embs: DataFrame,
    dim: int,
    k: int = DEFAULT_K,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """(id, proj array<bigint>): same contraction folded back to one
    array column — ONE groupBy with k conditional sums (internal shape
    for the ANN path; never crosses the driver boundary)."""
    long = rproject(embs, dim, k, id_col, emb_col)
    sums = [
        F.sum(F.when(F.col("j") == j, F.col("p"))).alias(f"_p{j}")
        for j in range(1, k + 1)
    ]
    wide = long.groupBy(id_col).agg(*sums)
    return wide.select(
        id_col,
        F.array(*[F.col(f"_p{j}") for j in range(1, k + 1)]).alias("proj"),
    )


def rproject_kernel(
    embs: DataFrame,
    dim: int,
    k: int = DEFAULT_K,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """Arrow path: per-batch int64 matmul via mapInPandas — no shuffle,
    no per-row Python. Bit-identical to rproject_wide (int64 matmul is
    exact; overflow impossible at these magnitudes)."""
    import numpy as np
    import pandas as pd

    S = np.array(
        [[_sign(d, j) for j in range(1, k + 1)] for d in range(1, dim + 1)],
        dtype=np.int64,
    )

    def gen(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            M = np.floor(
                np.stack(pdf[emb_col].values).astype(np.float64) * Q_SCALE
            ).astype(np.int64)
            proj = M @ S
            yield pd.DataFrame(
                {id_col: pdf[id_col].values, "proj": list(proj)}
            )

    src = ensure_parallelism(embs.select(id_col, emb_col))
    return src.mapInPandas(gen, f"{id_col} long, proj array<long>")


def sql_rproj_ctes(
    dim: int,
    k: int = DEFAULT_K,
    table: str = "embeddings",
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> str:
    """DuckDB mirror as CTEs defining ``rp`` (id, j, p) — same quantize,
    same md5 sign, same integer arithmetic."""
    return f"""
    rp_signs AS (
      SELECT d, j,
             CASE WHEN (CAST('0x' || SUBSTR(MD5('rp|' || d || '|' || j),
                                       1, 15) AS BIGINT) % {P}) % 2 = 0
                  THEN 1 ELSE -1 END AS s
      FROM UNNEST(GENERATE_SERIES(1, {dim})) AS t1(d),
           UNNEST(GENERATE_SERIES(1, {k})) AS t2(j)
    ), rp_q AS (
      SELECT {id_col} AS _id,
             UNNEST(GENERATE_SERIES(1, LEN({emb_col}))) AS d,
             UNNEST(LIST_TRANSFORM({emb_col},
                 x -> CAST(FLOOR(CAST(x AS DOUBLE) * {Q_SCALE}) AS BIGINT)))
               AS x
      FROM {table}
    ), rp AS (
      SELECT _id, j, CAST(SUM(x * s) AS BIGINT) AS p
      FROM rp_q JOIN rp_signs USING (d)
      GROUP BY _id, j
    )"""
