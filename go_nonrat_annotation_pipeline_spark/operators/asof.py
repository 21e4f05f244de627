"""Backward as-of join — an operator the reference lacks (its joins are
all equi-joins, SURVEY.md §2.3) but any time-series / attribution
workload needs: for every left row, the single right row with the
largest right_ts ≤ left_ts within the same key.

Spark-first physical strategy (the union-window formulation): tag both
sides, union, and run ONE window pass per key ordered by (ts, side) with
``last(payload, ignoreNulls=True)`` carrying the most recent right
payload forward onto each left row. Cost = one hash-partition shuffle on
the key + one in-partition sort — no range-join pair blowup, no
per-key driver loop, and skew only where a single key is itself hot.
The equivalent naive formulation (left ⋈ right on key, filter ts,
window max) shuffles |left|×|right-per-key| rows; this shuffles
|left|+|right|.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    payload_cols: list[str],
) -> DataFrame:
    """Left as-of join: every left row + the payload of the latest right
    row with right_ts <= left_ts (inclusive) for the same `on` key; null
    payload when no prior right row exists.

    Right rows are deduplicated per (key, ts) by max payload struct so
    tie-breaks are deterministic and engine-independent.
    """
    r = (
        right.groupBy(F.col(on).alias("_k"), F.col(right_ts).alias("_ts"))
        .agg(F.max(F.struct(*payload_cols)).alias("_p"))
        # side=0 sorts before left rows at the same instant → inclusive ≤
        .select("_k", "_ts", F.lit(0).alias("_side"), "_p")
    )
    lcols = left.columns
    l = left.select(
        F.col(on).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(r.schema["_p"].dataType).alias("_p"),
        *lcols,
    )
    w = (
        Window.partitionBy("_k")
        .orderBy("_ts", "_side")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = r.unionByName(l, allowMissingColumns=True).withColumn(
        "_filled", F.last("_p", ignorenulls=True).over(w)
    )
    out = filled.where(F.col("_side") == 1).select(
        *lcols, *[F.col(f"_filled.{c}").alias(c) for c in payload_cols]
    )
    return out
