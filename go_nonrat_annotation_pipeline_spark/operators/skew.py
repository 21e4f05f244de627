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


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: str,
    n_salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: fact rows scatter over n_salt sub-keys, the
    (small) dim side replicates n_salt×, and the join runs on
    (key, salt) — a hot fact key spreads across n_salt reduce tasks
    instead of one straggler.

    The fact-side salt is a deterministic hash of the whole row
    (xxhash64 over all columns), NOT rand(): retries and speculative
    tasks must re-derive the same placement. Semantically identical to
    ``fact.join(dim, on, how)`` for how in (inner, left) — each fact row
    still meets each matching dim row exactly once, because dim carries
    every salt value.

    Prefer ``F.broadcast(dim)`` when dim fits in memory (no shuffle at
    all); salting is for the mid-size dim that must shuffle but joins
    against a skewed fact key, where AQE's skew splitting can't help
    (e.g. when the downstream op pins the partitioning).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how}")
    f = fact.withColumn(
        "_salt", F.pmod(F.xxhash64(*fact.columns), F.lit(n_salt)).cast("int")
    )
    d = dim.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1)))
    ).withColumn("_salt", F.col("_salt").cast("int"))
    return f.join(d, [on, "_salt"], how).drop("_salt")


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
