"""Skew-mitigation operators (SURVEY.md §4 posture work).

Spark's partial aggregation (map-side combine) already neutralizes key
skew for algebraic aggregates (sum/count/min/max), and AQE splits skewed
join partitions at runtime. The remaining gap is COLLECT-style
aggregates (collect_set / collect_list): they have no map-side combine,
so a hot key funnels every one of its rows into a single reduce task —
the A3/A4 consolidation shape degenerates on a 100 TB corpus with a few
giant groups.

``salted_collect_set`` is the standard two-phase fix: a deterministic
salt (hash of the value, NOT random — keeps the plan replayable) fans
each hot group out over n_salt reduce tasks for the heavy distinct-set
phase; the second phase merges n_salt already-deduplicated fragments per
key, bounded by the distinct-value count, not the row count.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_collect_set(
    df: DataFrame,
    key_cols: list[str],
    value: Column,
    n_salt: int = 16,
    out_col: str = "tokens",
) -> DataFrame:
    """Distinct sorted value-set per key, skew-safe.

    Phase 1 groups on (key, salt) — a hot key's rows spread over n_salt
    tasks, each emitting a partial distinct set. Phase 2 merges the ≤
    n_salt partial arrays per key (flatten → distinct → sort). Output
    equals a plain ``collect_set`` + sort, shuffling the same bytes but
    never concentrating a group on one task.
    """
    salted = df.select(*key_cols, value.alias("_v")).withColumn(
        "_salt", F.pmod(F.xxhash64("_v"), F.lit(n_salt))
    )
    partial = salted.groupBy(*key_cols, "_salt").agg(
        F.collect_set("_v").alias("_part")
    )
    return partial.groupBy(*key_cols).agg(
        F.array_sort(F.array_distinct(F.flatten(F.collect_list("_part")))).alias(
            out_col
        )
    )
