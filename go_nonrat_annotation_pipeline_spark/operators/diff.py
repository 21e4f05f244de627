"""Snapshot diff (CDC classification) — the generic form of the
reference pipeline's upsert decision.

The reference's load step classifies each incoming annotation against
the stored table as insert / update-in-place / stale
(``DAO.java:169-226``, ``MAHDL.java:127-187``; re-expressed in
pipeline/sink.py and attested by a7/a8). ``snapshot_diff`` generalizes
that to any pair of keyed snapshots: one null-safe full outer join
classifying every key as added / deleted / changed / unchanged — the
primitive behind incremental loads, data-freshness audits, and
backfill validation on a 100 TB lakehouse table.

Scale posture: ONE shuffle, the full-outer hash join on the key
columns (or zero shuffles when both snapshots are bucketed on the key
— pipeline/sink.AnnotStore.save_bucketed demonstrates that layout).
Comparison is a null-safe equality per compared column, all JVM-side
whole-stage codegen; the output is as wide as the input, so downstream
aggregation (counts per change_type) combines map-side.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


CHANGE_COL = "change_type"


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Classify every key across two snapshots.

    Returns the key columns + ``change_type`` ∈
    {'added','deleted','changed','unchanged'} + the old/new value of
    each compared column (``<col>_old`` / ``<col>_new``).

    Null-safe throughout: a NULL→NULL field is unchanged, NULL→value is
    changed (Spark ``eqNullSafe`` ≡ DuckDB ``IS NOT DISTINCT FROM``).
    """
    if compare_cols is None:
        compare_cols = [c for c in old.columns if c not in keys]
    o = old.select(
        *[F.col(k).alias(f"_k_{k}") for k in keys],
        *[F.col(c).alias(f"{c}_old") for c in compare_cols],
        F.lit(True).alias("_in_old"),
    )
    n = new.select(
        *[F.col(k).alias(f"_nk_{k}") for k in keys],
        *[F.col(c).alias(f"{c}_new") for c in compare_cols],
        F.lit(True).alias("_in_new"),
    )
    cond = reduce(
        lambda a, b: a & b,
        [o[f"_k_{k}"].eqNullSafe(n[f"_nk_{k}"]) for k in keys],
    )
    j = o.join(n, cond, "full_outer")
    same = reduce(
        lambda a, b: a & b,
        [
            F.col(f"{c}_old").eqNullSafe(F.col(f"{c}_new"))
            for c in compare_cols
        ],
    )
    change = (
        F.when(F.col("_in_old").isNull(), F.lit("added"))
        .when(F.col("_in_new").isNull(), F.lit("deleted"))
        .when(same, F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    key_out = [
        F.coalesce(F.col(f"_k_{k}"), F.col(f"_nk_{k}")).alias(k) for k in keys
    ]
    val_out = [
        c
        for col in compare_cols
        for c in (F.col(f"{col}_old"), F.col(f"{col}_new"))
    ]
    return j.select(*key_out, change.alias(CHANGE_COL), *val_out)


def diff_counts(diff: DataFrame, extra_group: list[str] | None = None) -> DataFrame:
    """Per-change_type row counts (map-side combine), optionally
    sub-grouped — the audit report a reload job logs."""
    groups = [CHANGE_COL] + (extra_group or [])
    return diff.groupBy(*groups).agg(F.count(F.lit(1)).alias("n"))
