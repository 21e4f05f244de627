"""Fixed-point PageRank over edge DataFrames.

Domain/page ranking is a standard curation signal for web-scale corpus
pipelines (rank hosts by link authority, keep the head). Spark's
DataFrame API expresses one PageRank iteration as join + groupBy-sum;
the catch for THIS repo's cross-engine correctness gate is floating
point: double-precision rank mass summed in different orders diverges
between engines. So ranks are computed in FIXED-POINT BIGINT
arithmetic (scale 10^12): every operation is integer multiply /
integer divide / integer sum, which is bit-exact in any engine, making
the query hash-safe by construction instead of by rounding.

Both engines must truncate identically: all intermediate quantities
here are non-negative, where Spark's ``DIV`` (toward zero) and
DuckDB's ``//`` (toward -inf) agree.

Scale posture: each iteration is one corpus-sized shuffle (the
groupBy-sum on the destination node) plus two bounded joins against
the degree table; iteration count is a small constant. The groupBy
re-shuffles to spark.sql.shuffle.partitions each round, so lineage
grows linearly and partition count stays flat (no per-round
repartition needed — contrast the looped-union growth noted in the
verify notes). Total rank mass is conserved (≤ scale), so 85·sum
stays far below int64 overflow.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

SCALE = 10**12
_D_NUM = 85  # damping 0.85 as an integer fraction
_D_DEN = 100


def pagerank_fixed_point(
    edges: DataFrame, iters: int = 3, top_k: int = 20
) -> DataFrame:
    """(rank, node, r_fp): top-k nodes by fixed-point PageRank.

    PRECONDITION: ``edges`` must be a DISTINCT undirected edge table
    with ``a < b`` on every row (no duplicates, no reversed copies, no
    self-loops) — exactly the operators/graph.co_occurrence_edges
    contract. The symmetrizing union below relies on it: the two
    directions are disjoint by construction, so no dedup shuffle is
    spent. Input violating the contract silently inflates degrees and
    ranks (the DuckDB mirror sql_pagerank_ctes dedups via UNION, so a
    violation shows up as a cross-engine mismatch, not an error).
    The single driver-side action is the node COUNT (one scalar).
    """
    # Pin the symmetrized edge table ONCE: it is referenced in every
    # iteration, and without the checkpoint each reference re-executes
    # the whole upstream edge-builder (explode/distinct/aggregate).
    # No distinct here: edges is a DISTINCT a < b table (the
    # co_occurrence_edges contract), so the two directions are disjoint
    # by construction and deduplicating the union would be one wasted
    # corpus-sized shuffle.
    sym = (
        edges.select(F.col("a").alias("u"), F.col("b").alias("v"))
        .unionByName(
            edges.select(F.col("b").alias("u"), F.col("a").alias("v"))
        )
        .localCheckpoint()
    )
    deg = sym.groupBy("u").agg(F.count(F.lit(1)).alias("degree"))
    n = deg.count()
    base = SCALE // n
    teleport = (_D_DEN - _D_NUM) * base // _D_DEN
    # Rename-before-join: sym/deg/ranks share lineage, so qualified
    # self-join columns would be ambiguous to the analyzer.
    node_deg = deg.select(F.col("u").alias("node"), "degree").localCheckpoint()
    ranks = node_deg.select("node", F.lit(base).alias("r"))
    for _ in range(iters):
        contrib = (
            ranks.join(node_deg, "node")
            .select(
                F.col("node").alias("src"),
                F.expr("r DIV degree").alias("contrib"),
            )
        )
        ranks = (
            sym.join(contrib, sym["u"] == contrib["src"])
            .groupBy("v")
            .agg(F.sum("contrib").alias("s"))
            .select(
                F.col("v").alias("node"),
                (
                    F.lit(teleport)
                    + F.expr(f"({_D_NUM} * s) DIV {_D_DEN}")
                ).alias("r"),
            )
        )
    # limit(top_k) bounds the single-partition rank window to k rows.
    top = ranks.orderBy(F.desc("r"), F.asc("node")).limit(top_k)
    return top.select(
        F.row_number()
        # k rows post-limit: constant-partition convention keeps the
        # rank window off the single-partition warning path
        .over(
            Window.partitionBy(F.col("node") % 1).orderBy(
                F.desc("r"), F.asc("node")
            )
        )
        .alias("rank"),
        "node",
        F.col("r").alias("r_fp"),
    )


def sql_pagerank_ctes(iters: int = 3, edges_cte: str = "edges") -> str:
    """DuckDB CTE chain mirroring ``pagerank_fixed_point`` exactly
    (append after an ``edges(a, b)`` CTE); final relation is
    ``r{iters}(node, r)``. Every SUM is cast back to BIGINT (DuckDB
    widens integer SUM to HUGEINT — the round-5 red-row lesson)."""
    parts = [
        f"""sym AS (
      SELECT a AS u, b AS v FROM {edges_cte}
      UNION SELECT b AS u, a AS v FROM {edges_cte}
    ), deg AS (
      SELECT u, CAST(COUNT(*) AS BIGINT) AS degree FROM sym GROUP BY 1
    ), consts AS (
      SELECT CAST({SCALE} // COUNT(*) AS BIGINT) AS base,
             CAST(({_D_DEN - _D_NUM} * ({SCALE} // COUNT(*))) // {_D_DEN}
                  AS BIGINT) AS tele
      FROM deg
    ), r0 AS (
      SELECT u AS node, (SELECT base FROM consts) AS r FROM deg
    )"""
    ]
    for i in range(1, iters + 1):
        parts.append(
            f"""r{i} AS (
      SELECT v AS node,
             (SELECT tele FROM consts)
               + ({_D_NUM} * CAST(SUM(contrib) AS BIGINT)) // {_D_DEN} AS r
      FROM (SELECT s.v, r.r // d.degree AS contrib
            FROM r{i - 1} r
            JOIN deg d ON r.node = d.u
            JOIN sym s ON s.u = r.node)
      GROUP BY v
    )"""
        )
    return ", ".join(parts)
