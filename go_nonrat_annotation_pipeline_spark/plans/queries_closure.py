"""Iterate-to-fixpoint closure queries (SURVEY.md §2.3 J4/J10).

The engine's `transitive_descendants` / `resolve_history` operators are
driven against a deterministic DAG derived from the `part` table
(edge: k → k div 2), hash-checked against DuckDB WITH RECURSIVE — the
same semantics the reference delegates to Oracle CONNECT BY
(rgdcore OntologyXDAO.isDescendantOf / RGDManagementDAO history chains).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators.closure import resolve_history, transitive_descendants
from ..sources.testdata import load_table
from .registry import register


def _halving_edges(part):
    """History edges: even partkey → partkey/2 (terminals are odd keys)."""
    return part.where((F.col("p_partkey") % 2 == 0) & (F.col("p_partkey") > 0)).select(
        F.col("p_partkey").alias("old_id"),
        F.expr("p_partkey div 2").alias("new_id"),
    )


# ---------------------------------------------------------------------------
# J4 — retired-ID history chain resolution to a terminal id
# (MAHQC.java:169-193; rgdcore getActiveRgdIdFromHistory)
# ---------------------------------------------------------------------------
@register(
    "j04_history_resolution",
    """
    WITH RECURSIVE chain AS (
      SELECT DISTINCT l_partkey AS id, l_partkey AS cur FROM lineitem
      UNION ALL
      SELECT c.id, e.new_id
      FROM chain c
      JOIN (SELECT p_partkey AS old_id, p_partkey // 2 AS new_id
            FROM part WHERE p_partkey % 2 = 0 AND p_partkey > 0) e
        ON e.old_id = c.cur
    )
    SELECT id AS l_partkey, cur AS resolved_id
    FROM chain WHERE cur % 2 = 1 OR cur = 0
    """,
    doc="J4: follow old→new chains to fixpoint (iterative self-join)",
)
def j04_history_resolution(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    ids = li.select(F.col("l_partkey").alias("id"))
    resolved = resolve_history(_halving_edges(part), ids)
    return resolved.select(F.col("id").alias("l_partkey"), "resolved_id")


# ---------------------------------------------------------------------------
# J10 — transitive-descendant anti-join: drop gated rows whose key falls in
# the descendant closure of a seed node (MAHQC.java:69-75 — IPI ×
# catalytic-activity subtree)
# ---------------------------------------------------------------------------
@register(
    "j10_descendant_anti_join",
    """
    WITH RECURSIVE descendants AS (
      SELECT CAST(5 AS BIGINT) AS node
      UNION ALL
      SELECT e.child FROM descendants d
      JOIN (SELECT p_partkey AS child, p_partkey // 2 AS parent
            FROM part WHERE p_partkey >= 2) e
        ON e.parent = d.node
    )
    SELECT l.l_orderkey, l.l_linenumber, l.l_partkey
    FROM lineitem l
    WHERE NOT (l.l_returnflag = 'R'
               AND EXISTS (SELECT 1 FROM descendants d WHERE d.node = l.l_partkey))
    """,
    doc="J10: anti-join against iteratively computed descendant closure",
)
def j10_descendant_anti_join(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    dag = part.where(F.col("p_partkey") >= 2).select(
        F.col("p_partkey").alias("child"),
        F.expr("p_partkey div 2").alias("parent"),
    )
    seeds = spark.range(5, 6).select(F.col("id").alias("node"))
    desc = transitive_descendants(dag, seeds)
    # per-row predicate: drop iff (gated AND key ∈ closure) — a left join to
    # the (broadcast) closure marker keeps row multiplicity exact
    j = li.join(F.broadcast(desc), li.l_partkey == desc.node, "left")
    return j.where(
        ~((F.col("l_returnflag") == "R") & F.col("node").isNotNull())
    ).select("l_orderkey", "l_linenumber", "l_partkey")
