"""Distributed graph analytics over edge DataFrames.

Complements operators/dedup.py's connected components with the other
graph shapes a corpus pipeline hits: co-occurrence graph construction,
triangle counting, and bounded multi-hop reachability. All are pure
DataFrame compositions — self-joins on oriented edge tables — so
Catalyst picks shuffle vs broadcast per side and AQE handles skew.

Scale posture:

- ``co_occurrence_edges`` bounds the quadratic pair explosion per group
  with ``max_group`` (groups above it are dropped and counted instead of
  silently exploding — a 10k-item group would emit 50M pairs).
- ``triangle_count`` orients every edge low→high id BEFORE the wedge
  join, the standard trick that makes the join fan-out proportional to
  Σ d_i(d_i-1)/2 over the oriented out-degrees instead of total degrees
  — on skewed graphs orders of magnitude smaller — and counts each
  triangle exactly once instead of 6 times.
- ``k_hop_reach`` takes an explicit seed set (top-k by degree here, any
  predicate in general); frontier expansion is seeds ⋈ edges per hop, so
  cost scales with the seed neighborhoods, never all-pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def co_occurrence_edges(
    df: DataFrame,
    group_col: str,
    item_col: str,
    max_group: int = 1000,
) -> DataFrame:
    """Distinct undirected edges (a < b) between items sharing a group.

    Groups larger than ``max_group`` are excluded (near-quadratic pair
    emitters; at 100 TB one viral group would dominate the shuffle).
    """
    items = df.select(group_col, item_col).distinct()
    sizes = items.groupBy(group_col).agg(F.count("*").alias("__gs"))
    bounded = items.join(
        sizes.where(F.col("__gs") <= max_group).select(group_col), group_col
    )
    a = bounded.select(F.col(group_col).alias("g"), F.col(item_col).alias("a"))
    b = bounded.select(F.col(group_col).alias("g"), F.col(item_col).alias("b"))
    return (
        a.join(b, "g")
        .where(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )


def triangle_count(edges: DataFrame) -> DataFrame:
    """Exact global triangle / wedge / edge counts: one row
    (n_edges, n_wedges, n_triangles).

    Input edges are canonicalized to a < b. Wedges enumerate (a<b<c)
    via E ⋈ E on the shared low vertex; the closing edge lookup is a
    semi-join — each triangle is counted exactly once.
    """
    E = (
        edges.select(
            F.least("a", "b").alias("a"), F.greatest("a", "b").alias("b")
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
    )
    e1 = E.select(F.col("a").alias("u"), F.col("b").alias("v"))
    e2 = E.select(F.col("a").alias("u"), F.col("b").alias("w"))
    wedges = e1.join(e2, "u").where(F.col("v") < F.col("w"))
    closed = wedges.join(
        E.select(F.col("a").alias("v"), F.col("b").alias("w")), ["v", "w"]
    )
    return (
        E.agg(F.count("*").alias("n_edges"))
        .crossJoin(wedges.agg(F.count("*").alias("n_wedges")))
        .crossJoin(closed.agg(F.count("*").alias("n_triangles")))
    )


def k_hop_reach(edges: DataFrame, seeds: DataFrame, hops: int = 2) -> DataFrame:
    """Per-seed count of distinct vertices reachable in <= ``hops`` hops
    (excluding the seed itself): (node, reach).

    seeds: DataFrame with a single column ``node``. Frontier expansion
    joins the CURRENT reachable set against the symmetric edge list each
    hop; dedup per hop keeps the set minimal before the next join.
    """
    sym = (
        edges.select(F.col("a").alias("u"), F.col("b").alias("v"))
        .unionByName(edges.select(F.col("b").alias("u"), F.col("a").alias("v")))
        .distinct()
    )
    reach = seeds.select(F.col("node"), F.col("node").alias("v"))
    for _ in range(hops):
        # rename the join key on both sides: `reach` accumulates lineage
        # from `sym` after hop 1, and bare column refs would trip
        # Spark's ambiguous-self-join detection
        step = (
            reach.select("node", F.col("v").alias("__cur"))
            .join(
                sym.select(F.col("u").alias("__cur"), F.col("v").alias("__next")),
                "__cur",
            )
            .select("node", F.col("__next").alias("v"))
        )
        reach = reach.unionByName(step).distinct()
    return (
        reach.where(F.col("node") != F.col("v"))
        .groupBy("node")
        .agg(F.count("*").alias("reach"))
    )


def sql_co_occurrence_edges(
    from_sql: str, group_expr: str, item_expr: str, max_group: int = 1000
) -> str:
    """DuckDB oracle CTE body (same bounding, same orientation).
    Yields a relation named ``edges(a, b)`` — embed via
    ``WITH {this}, ... SELECT``."""
    return f"""
    gitems AS (
      SELECT DISTINCT {group_expr} AS g, {item_expr} AS it FROM {from_sql}
    ), gsizes AS (
      SELECT g FROM gitems GROUP BY g HAVING COUNT(*) <= {max_group}
    ), bounded AS (
      SELECT gitems.g, it FROM gitems JOIN gsizes USING (g)
    ), edges AS (
      SELECT DISTINCT x.it AS a, y.it AS b
      FROM bounded x JOIN bounded y ON x.g = y.g AND x.it < y.it
    )"""
