"""Upsert / stale-delete queries (SURVEY.md §2.4 A7/A8).

The engine's MERGE-style sink (operators/merge.py) classifies incoming
rows against the existing snapshot on a null-safe natural key into
INSERT / UPDATE / TOUCH, with stale rows guarded by a delete threshold —
the reference's incremental-update model (MAHDL.java:127-187,
DAO.java:169-226). Here the classification logic itself is oracle-checked
on two deterministic snapshots derived from `orders`.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..sources.testdata import load_table
from .registry import register

CUT = "TIMESTAMP '1999-07-01 00:00:00'"


def _snapshots(orders):
    """existing = pre-cutoff snapshot; incoming = overlapping later window
    with a deterministic payload drift on every 3rd key (update path)."""
    existing = orders.where(F.col("o_orderdate") < F.lit("1999-07-01 00:00:00").cast("timestamp")).select(
        F.col("o_orderkey").alias("key"),
        F.col("o_totalprice").alias("price"),
        F.col("o_orderpriority").alias("prio"),
    )
    incoming = orders.where(F.col("o_orderdate") >= F.lit("1998-01-01 00:00:00").cast("timestamp")).select(
        F.col("o_orderkey").alias("key"),
        F.when(F.col("o_orderkey") % 3 == 0, F.col("o_totalprice") + 1)
        .otherwise(F.col("o_totalprice"))
        .alias("price"),
        F.col("o_orderpriority").alias("prio"),
    )
    return existing, incoming


_SNAP_SQL = f"""
    existing AS (
      SELECT o_orderkey AS key, o_totalprice AS price, o_orderpriority AS prio
      FROM orders WHERE o_orderdate < {CUT}
    ), incoming AS (
      SELECT o_orderkey AS key,
             CASE WHEN o_orderkey % 3 = 0 THEN o_totalprice + 1 ELSE o_totalprice END AS price,
             o_orderpriority AS prio
      FROM orders WHERE o_orderdate >= TIMESTAMP '1998-01-01 00:00:00'
    )
"""


# ---------------------------------------------------------------------------
# A7 — upsert decision: INSERT / UPDATE / TOUCH / STALE per key
# ---------------------------------------------------------------------------
@register(
    "a7_upsert_classification",
    f"""
    WITH {_SNAP_SQL}
    SELECT COALESCE(i.key, e.key) AS key,
           CASE WHEN e.key IS NULL THEN 'INSERT'
                WHEN i.key IS NULL THEN 'STALE'
                WHEN i.price <> e.price OR i.prio <> e.prio THEN 'UPDATE'
                ELSE 'TOUCH' END AS action
    FROM incoming i FULL OUTER JOIN existing e ON i.key = e.key
    """,
    doc="A7: MERGE decision — insert/update/touch/stale per natural key",
)
def a7_upsert_classification(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    existing, incoming = _snapshots(orders)
    e = existing.select(
        F.col("key").alias("e_key"), F.col("price").alias("e_price"), F.col("prio").alias("e_prio")
    )
    j = incoming.join(e, incoming.key == e.e_key, "full_outer")
    return j.select(
        F.coalesce(F.col("key"), F.col("e_key")).alias("key"),
        F.when(F.col("e_key").isNull(), "INSERT")
        .when(F.col("key").isNull(), "STALE")
        .when(
            (F.col("price") != F.col("e_price")) | (F.col("prio") != F.col("e_prio")),
            "UPDATE",
        )
        .otherwise("TOUCH")
        .alias("action"),
    )


# ---------------------------------------------------------------------------
# A8 — threshold-guarded stale delete: compute candidates, current count,
# percentage threshold, and the abort/proceed decision as data
# ---------------------------------------------------------------------------
@register(
    "a8_threshold_guarded_delete",
    f"""
    WITH {_SNAP_SQL}
    SELECT COUNT(*) AS current_count,
           CAST(SUM(CASE WHEN i.key IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS stale_count,
           CAST(FLOOR(COUNT(*) * 0.10) AS BIGINT) AS threshold,
           (CAST(SUM(CASE WHEN i.key IS NULL THEN 1 ELSE 0 END) AS BIGINT) <= CAST(FLOOR(COUNT(*) * 0.10) AS BIGINT)) AS do_delete
    FROM existing e LEFT JOIN incoming i ON e.key = i.key
    """,
    doc="A8: stale-delete candidates + 10% abort threshold as a decision row",
)
def a8_threshold_guarded_delete(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    existing, incoming = _snapshots(orders)
    j = existing.join(
        incoming.select(F.col("key").alias("i_key")),
        existing.key == F.col("i_key"),
        "left",
    )
    agg = j.agg(
        F.count(F.lit(1)).alias("current_count"),
        F.sum(F.when(F.col("i_key").isNull(), 1).otherwise(0)).alias("stale_count"),
    )
    return agg.select(
        "current_count",
        "stale_count",
        F.floor(F.col("current_count") * 0.10).cast("long").alias("threshold"),
        (
            F.col("stale_count") <= F.floor(F.col("current_count") * 0.10).cast("long")
        ).alias("do_delete"),
    )
