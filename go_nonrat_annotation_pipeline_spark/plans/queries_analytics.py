"""General-analytics surface beyond the reference's operator set:
as-of join, discrete percentiles, pivot, CUBE grouping sets, and the
skew-safe salted collect (SURVEY.md §2.5 'general operator surface').

Every query is deterministic and oracle-mirrored; percentile selection
uses the window-rank formulation in BOTH engines so no interpolation
arithmetic can diverge.
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..operators.asof import asof_join_backward
from ..operators.skew import salted_collect_set
from ..sources.testdata import load_table
from .registry import register


# ---------------------------------------------------------------------------
# Backward as-of join: purchase → most recent prior click of the same
# user (classic attribution). One union-window pass per user, no range
# blowup (operators/asof.py).
# ---------------------------------------------------------------------------
@register(
    "q_asof_attribution",
    """
    WITH clicks AS (
      SELECT user_id AS _k, ts AS _ts, MAX(event_id) AS click_event_id
      FROM events WHERE event_type = 'click' GROUP BY user_id, ts
    ), purchases AS (
      SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
    )
    SELECT p.event_id, p.user_id, c.click_event_id
    FROM purchases p ASOF LEFT JOIN clicks c
      ON p.user_id = c._k AND p.ts >= c._ts
    """,
    doc="as-of join: purchase attributed to latest prior click per user",
)
def q_asof_attribution(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = ev.where(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("event_id").alias("click_event_id")
    )
    return asof_join_backward(
        purchases, clicks, "user_id", "ts", "ts", ["click_event_id"]
    ).select("event_id", "user_id", "click_event_id")


# ---------------------------------------------------------------------------
# Discrete percentiles per group via window-rank selection — identical
# rank arithmetic in both engines (no interpolation float risk).
# ---------------------------------------------------------------------------
@register(
    "q_percentile_disc",
    """
    WITH ranked AS (
      SELECT o_orderstatus, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_orderstatus
                                ORDER BY o_totalprice, o_orderkey) AS rn,
             COUNT(*) OVER (PARTITION BY o_orderstatus) AS n
      FROM orders
    )
    SELECT o_orderstatus,
           MAX(CASE WHEN rn = CAST(CEIL(0.5 * n) AS BIGINT) THEN o_totalprice END) AS p50,
           MAX(CASE WHEN rn = CAST(CEIL(0.9 * n) AS BIGINT) THEN o_totalprice END) AS p90,
           CAST(MAX(n) AS BIGINT) AS n_orders
    FROM ranked GROUP BY o_orderstatus
    """,
    doc="discrete p50/p90 per group via window-rank selection",
)
def q_percentile_disc(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_orderstatus").orderBy("o_totalprice", "o_orderkey")
    wc = W.partitionBy("o_orderstatus")
    ranked = orders.select(
        "o_orderstatus",
        "o_totalprice",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wc).alias("n"),
    )
    pick = lambda q: F.max(  # noqa: E731
        F.when(
            F.col("rn") == F.ceil(F.lit(q) * F.col("n")).cast("long"),
            F.col("o_totalprice"),
        )
    )
    return ranked.groupBy("o_orderstatus").agg(
        pick(0.5).alias("p50"),
        pick(0.9).alias("p90"),
        F.max("n").cast("long").alias("n_orders"),
    )


# ---------------------------------------------------------------------------
# PIVOT: event_type → wide count columns (explicit value list keeps the
# plan one-pass; Spark otherwise scans once just to discover values).
# ---------------------------------------------------------------------------
@register(
    "q_pivot_event_counts",
    """
    SELECT user_id % 10 AS user_bucket,
           CAST(COUNT(*) FILTER (WHERE event_type = 'purchase') AS BIGINT) AS n_purchase,
           CAST(COUNT(*) FILTER (WHERE event_type = 'click') AS BIGINT) AS n_click,
           CAST(COUNT(*) FILTER (WHERE event_type = 'signup') AS BIGINT) AS n_signup
    FROM events GROUP BY user_id % 10
    """,
    doc="pivot event_type into wide per-bucket count columns",
)
def q_pivot_event_counts(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.withColumn("user_bucket", F.col("user_id") % 10)
        .groupBy("user_bucket")
        .pivot("event_type", ["purchase", "click", "signup"])
        .count()
        .select(
            "user_bucket",
            F.coalesce("purchase", F.lit(0)).alias("n_purchase"),
            F.coalesce("click", F.lit(0)).alias("n_click"),
            F.coalesce("signup", F.lit(0)).alias("n_signup"),
        )
    )


# ---------------------------------------------------------------------------
# CUBE grouping sets — all four (status, priority) subtotal combinations
# in one expand + one hash-aggregate shuffle (same plan family as the
# ROLLUP query).
# ---------------------------------------------------------------------------
@register(
    "q_cube_status_priority",
    """
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
    doc="CUBE grouping sets in one shuffle",
)
def q_cube_status_priority(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    return orders.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders")
    )


# ---------------------------------------------------------------------------
# q_salted_skew_join moved to queries_r4_fixes.py (round 4): the money
# sum is now integer cents (BIGINT) so no double→decimal rounding sits
# at the driver's hash boundary.
# ---------------------------------------------------------------------------


# ---------------------------------------------------------------------------
# Semi-structured extraction: from_json projects the props JSON into a
# typed struct inside codegen (one pass, no UDF); aggregation is then a
# plain hash-agg on the extracted field.
# ---------------------------------------------------------------------------
@register(
    "q_json_extract",
    """
    SELECT event_type,
           CAST(SUM(CAST(JSON_EXTRACT_STRING(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
           CAST(COUNT(JSON_EXTRACT_STRING(props, '$.k')) AS BIGINT) AS n_with_k
    FROM events GROUP BY event_type
    """,
    doc="JSON props → typed struct (from_json) → per-type aggregate",
)
def q_json_extract(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    parsed = ev.select(
        "event_type", F.from_json("props", "k BIGINT").alias("p")
    )
    return parsed.groupBy("event_type").agg(
        F.sum("p.k").cast("long").alias("sum_k"),
        F.count("p.k").cast("long").alias("n_with_k"),
    )


# ---------------------------------------------------------------------------
# Skew-safe distinct-set consolidation: 3 hot keys over the whole fact
# table; the salted two-phase plan never concentrates a key on one task
# (operators/skew.py — collect_set has no map-side combine otherwise).
# ---------------------------------------------------------------------------
@register(
    "q_skew_salted_tokens",
    """
    SELECT l_returnflag,
           ARRAY_TO_STRING(LIST_SORT(LIST_DISTINCT(
               LIST('S' || CAST(l_suppkey AS VARCHAR)))), '|') AS supp_set,
           CAST(LEN(LIST_DISTINCT(LIST('S' || CAST(l_suppkey AS VARCHAR)))) AS BIGINT) AS n_supp
    FROM lineitem GROUP BY l_returnflag
    """,
    doc="skew-safe salted two-phase collect_set on 3 hot keys",
)
def q_skew_salted_tokens(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    tok = F.concat(F.lit("S"), F.col("l_suppkey").cast("string"))
    out = salted_collect_set(li, ["l_returnflag"], tok, n_salt=16)
    return out.select(
        "l_returnflag",
        F.concat_ws("|", F.col("tokens")).alias("supp_set"),
        F.size("tokens").cast("long").alias("n_supp"),
    )


# ---------------------------------------------------------------------------
# Scalar subquery (filter vs a global aggregate): expressed as one DAG —
# the 1-row aggregate broadcasts onto the fact scan; the threshold
# compare is decimal-exact on both engines (price*n > total avoids a
# float-average ulp divergence at the boundary).
# ---------------------------------------------------------------------------
@register(
    "q_scalar_subquery",
    """
    WITH s AS (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS tot,
                      COUNT(*) AS n FROM orders)
    SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n_above
    FROM orders, s
    WHERE CAST(o_totalprice AS DECIMAL(18,2)) * n > tot
    GROUP BY o_orderstatus
    """,
    doc="scalar subquery: above-global-average filter via broadcast 1-row agg",
)
def q_scalar_subquery(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    price = F.col("o_totalprice").cast("decimal(18,2)")
    s = orders.agg(
        F.sum(price).cast("decimal(38,2)").alias("tot"),
        F.count(F.lit(1)).alias("n"),
    )
    return (
        orders.join(F.broadcast(s))
        .where(price * F.col("n") > F.col("tot"))
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n_above"))
    )


# ---------------------------------------------------------------------------
# Multi-distinct aggregation: two COUNT(DISTINCT) + COUNT(*) in one
# statement — Catalyst compiles to a single Expand-based aggregate pass,
# not three scans.
# ---------------------------------------------------------------------------
@register(
    "q_multi_distinct",
    """
    SELECT o_orderstatus,
           CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_cust,
           CAST(COUNT(DISTINCT o_orderpriority) AS BIGINT) AS n_prio,
           CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM orders GROUP BY o_orderstatus
    """,
    doc="multi-distinct aggregate in one Expand pass",
)
def q_multi_distinct(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderstatus").agg(
        F.count_distinct(F.col("o_custkey")).alias("n_cust"),
        F.count_distinct(F.col("o_orderpriority")).alias("n_prio"),
        F.count(F.lit(1)).alias("n_orders"),
    )
