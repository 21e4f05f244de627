"""Distributed ranking without a global single-task sort.

Ranking a corpus-sized column with `RANK() OVER (ORDER BY v)` funnels
everything through ONE window task — the exact anti-pattern the
retrieval family documents (retrieval.py:164). The scale-safe shape,
implemented here as a reusable operator:

1. collapse to the DISTINCT-VALUE table with per-value counts (one
   hash shuffle; ties are handled exactly, by construction);
2. `repartitionByRange` the distinct values (Spark's range exchange —
   sampled boundaries, no driver sort) and compute LOCAL rank/cumsum
   per range partition with a window PARTITIONED by the range id;
3. offset each partition by the broadcast prefix of lower partitions'
   counts (a <=B-row frame — B is the fixed bucket count, so driver
   cost is O(B) regardless of corpus size).

Distinct values cannot straddle a range boundary (each value lands in
exactly one partition), so cross-partition tie groups cannot occur and
the assembled global ranks are exact. Used by the Spearman correlation
query; any "global rank / ntile / percent_rank at scale" need can
reuse it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def value_rank2(df: DataFrame, col: str, buckets: int = 32) -> DataFrame:
    """Exact tie-aware ranks for every distinct value of ``col``.

    Returns (``col``, ``cnt``, ``rank2``) where ``rank2`` is TWICE the
    average (fractional) rank of that value's tie group — an integer:
    for a group occupying ranks [r, r+c-1], avg*2 = 2r + c - 1. Using
    doubled ranks keeps downstream arithmetic (Spearman moments) in
    exact integers; scaling both rank vectors by 2 leaves Pearson's r
    on them unchanged.
    """
    counts = df.where(F.col(col).isNotNull()).groupBy(col).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    ranged = counts.repartitionByRange(buckets, F.col(col)).withColumn(
        "_pid", F.spark_partition_id()
    )
    wloc = Window.partitionBy("_pid").orderBy(col)
    local = ranged.withColumn(
        "_loc_end", F.sum("cnt").over(wloc)
    )  # within-partition cumulative count at group end
    totals = local.groupBy("_pid").agg(F.sum("cnt").alias("_tot"))
    wpre = (
        Window.partitionBy(F.col("_pid") % 1)
        .orderBy("_pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )  # <=B rows: column-derived constant partition, warning-free
    prefix = totals.withColumn(
        "_prefix", F.coalesce(F.sum("_tot").over(wpre), F.lit(0))
    ).select("_pid", "_prefix")
    return (
        local.join(F.broadcast(prefix), "_pid")
        .withColumn("_end", F.col("_prefix") + F.col("_loc_end"))
        # min rank r = end - cnt + 1; rank2 = 2r + cnt - 1 = 2*end - cnt + 1
        .withColumn(
            "rank2",
            (F.lit(2) * F.col("_end") - F.col("cnt") + F.lit(1)).cast(
                "long"
            ),
        )
        .select(col, "cnt", "rank2")
    )
