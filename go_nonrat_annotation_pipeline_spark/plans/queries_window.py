"""Window-function and set-operation queries (SURVEY.md §2.5).

The reference itself has no window functions; the engine ships them as
part of the general operator surface (top-k per group, running
aggregates, gap-based sessionization) — required by the north-star
dedup/similarity extensions and general OLAP parity.
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..sources.testdata import load_table
from .registry import register


# ---------------------------------------------------------------------------
# W1 — top-k per group via row_number (deterministic tie-break)
# ---------------------------------------------------------------------------
@register(
    "w1_topk_per_group",
    """
    SELECT o_custkey, o_orderkey, o_totalprice, rn
    FROM (SELECT o_custkey, o_orderkey, o_totalprice,
                 ROW_NUMBER() OVER (PARTITION BY o_custkey
                                    ORDER BY o_totalprice DESC, o_orderkey) AS rn
          FROM orders)
    WHERE rn <= 3
    """,
    doc="W: top-3 orders per customer (ranking window)",
)
def w1_topk_per_group(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
    )


# ---------------------------------------------------------------------------
# W2 — gap-based sessionization: lag + cumulative boundary sum
# ---------------------------------------------------------------------------
@register(
    "w2_sessionize",
    """
    SELECT event_id, user_id, session_id FROM (
      SELECT event_id, user_id,
             CAST(SUM(is_new) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id
                                    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
      FROM (SELECT event_id, user_id, ts,
                   CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                             > INTERVAL 30 MINUTE OR
                        LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                        THEN 1 ELSE 0 END AS is_new
            FROM events))
    """,
    doc="W: gap>30min sessionization via lag + running sum",
)
def w2_sessionize(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.col("ts").cast("long") - F.lag(F.col("ts").cast("long")).over(w)
    flagged = ev.withColumn(
        "is_new", F.when(gap.isNull() | (gap > 1800), 1).otherwise(0)
    )
    return flagged.select(
        "event_id",
        "user_id",
        F.sum("is_new").over(w.rowsBetween(W.unboundedPreceding, 0)).alias("session_id"),
    )


# ---------------------------------------------------------------------------
# Set ops — EXCEPT / UNION over key sets (SURVEY §2.5; multi-file source
# union MAHParser.java:41)
# ---------------------------------------------------------------------------
@register(
    "set_ops_except_union",
    """
    (SELECT DISTINCT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
     EXCEPT
     SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'O')
    UNION
    SELECT DISTINCT c_custkey FROM customer WHERE c_acctbal > 9900
    """,
    doc="set ops: EXCEPT then UNION on key sets",
)
def set_ops_except_union(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    f_cust = orders.where(F.col("o_orderstatus") == "F").select(
        F.col("o_custkey").alias("custkey")
    ).distinct()
    o_cust = orders.where(F.col("o_orderstatus") == "O").select(
        F.col("o_custkey").alias("custkey")
    ).distinct()
    rich = cust.where(F.col("c_acctbal") > 9900).select(
        F.col("c_custkey").alias("custkey")
    )
    return f_cust.exceptAll(o_cust).union(rich).distinct()


# ---------------------------------------------------------------------------
# Array set algebra — union/distinct/except on token arrays (SURVEY §2.5:
# TreeSet unions in MAHDL.java:73-77 → array functions)
# ---------------------------------------------------------------------------
@register(
    "set_array_algebra",
    """
    SELECT l_orderkey,
           COALESCE(ARRAY_TO_STRING(LIST_SORT(LIST_DISTINCT(LIST('S' || CAST(l_suppkey AS VARCHAR)))), '|'), '') AS supp_set,
           COALESCE(ARRAY_TO_STRING(
             LIST_FILTER(LIST_SORT(LIST_DISTINCT(LIST('S' || CAST(l_partkey % 100 AS VARCHAR)))),
                         t -> NOT LIST_CONTAINS(LIST_SORT(LIST_DISTINCT(LIST('S' || CAST(l_suppkey AS VARCHAR)))), t)),
             '|'), '') AS part_minus_supp
    FROM lineitem
    GROUP BY l_orderkey
    """,
    doc="array set algebra: collect_set, sort, except, serialize",
)
def set_array_algebra(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    supp_tok = F.concat(F.lit("S"), F.col("l_suppkey").cast("string"))
    part_tok = F.concat(F.lit("S"), (F.col("l_partkey") % 100).cast("string"))
    g = li.groupBy("l_orderkey").agg(
        F.array_sort(F.collect_set(supp_tok)).alias("supp"),
        F.array_sort(F.collect_set(part_tok)).alias("ptok"),
    )
    return g.select(
        "l_orderkey",
        F.concat_ws("|", F.col("supp")).alias("supp_set"),
        F.concat_ws("|", F.array_except("ptok", "supp")).alias("part_minus_supp"),
    )


# ---------------------------------------------------------------------------
# W3 — native session_window (Spark's built-in gap-merge sessionization;
# same semantics as the lag+cumsum form in w2 and the stateful stream
# variant — three formulations, one oracle family). groupBy(user,
# session_window) is one shuffle; windows merge inside the aggregate.
# ---------------------------------------------------------------------------
@register(
    "w3_session_window_native",
    """
    WITH flagged AS (
      SELECT user_id, ts,
             CASE WHEN LAG(ts) OVER w IS NULL
                    OR ts - LAG(ts) OVER w > INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS new_s
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ), sess AS (
      SELECT user_id, ts,
             SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
                              ROWS UNBOUNDED PRECEDING) AS sid
      FROM flagged
    )
    SELECT user_id, CAST(epoch_us(MIN(ts)) AS BIGINT) AS session_start_us,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM sess GROUP BY user_id, sid
    """,
    doc="W: native session_window sessionization (gap 30min); session "
    "start as epoch-microseconds BIGINT (r5 boundary-type discipline: no "
    "raw TIMESTAMP columns at the driver hash boundary)",
)
def w3_session_window_native(spark, sf_dir):
    from ..sources.testdata import load_table as _lt

    ev = _lt(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id", F.session_window("ts", "30 minutes"))
        .agg(
            F.min("ts").alias("session_start"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select(
            "user_id",
            F.unix_micros("session_start").alias("session_start_us"),
            "n_events",
        )
    )
