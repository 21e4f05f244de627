"""Leakage-safe train/validation/test splitting.

Naive corpus splitting hashes each document id into a split — but a
corpus with duplicate/near-duplicate families then puts copies of the
same content on BOTH sides of the train/eval boundary, and eval scores
measure memorization (the same failure benchmark decontamination
guards against, arising from the corpus's own internal redundancy;
see Lee et al. 2022 "Deduplicating Training Data Makes Language
Models Better" §6 train/test leakage).

The fix is structural, not statistical: hash the DEDUP-CLUSTER key,
not the doc id, so every member of a duplicate family lands in the
same split BY CONSTRUCTION — leakage is provably zero, no audit
sampling needed. Any cluster key works (exact content key, MinHash
cluster canonical id, URL host); the split assignment is one
deterministic md5 gate per row:

- assignment is a pure map (no shuffle): split = pct-bucket of
  md5(salt | cluster_key) — the repo's standard cross-engine gate
  (same convention as dedup-aware sampling / mixture draws);
- the leakage audit is one (cluster → distinct splits) aggregate —
  COUNT(DISTINCT split) > 1 per cluster, zero rows for cluster-keyed
  assignment, strictly positive for the naive doc-id twin on any
  corpus with cross-doc duplicate families;
- the salt versions the split: bumping it re-rolls membership without
  correlation to the previous epoch's split (held-out rotation).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from ..functions import hashing as H

TRAIN_PCT = 80
VAL_PCT = 10  # test gets the remainder


def split_of(key: Column, salt: str, train_pct: int = TRAIN_PCT,
             val_pct: int = VAL_PCT) -> Column:
    """Deterministic split label from a (cluster) key column."""
    bucket = H.char_hash(F.concat(F.lit(salt + "|"), key.cast("string"))) % 100
    return (
        F.when(bucket < train_pct, F.lit("train"))
        .when(bucket < train_pct + val_pct, F.lit("val"))
        .otherwise(F.lit("test"))
    )


def sql_split_of(key_expr: str, salt: str, train_pct: int = TRAIN_PCT,
                 val_pct: int = VAL_PCT) -> str:
    """DuckDB mirror of :func:`split_of`."""
    bucket = (
        H.sql_char_hash(f"'{salt}|' || CAST({key_expr} AS VARCHAR)")
        + " % 100"
    )
    return (
        f"(CASE WHEN {bucket} < {train_pct} THEN 'train' "
        f"WHEN {bucket} < {train_pct + val_pct} THEN 'val' "
        f"ELSE 'test' END)"
    )


def assign_splits(
    docs: DataFrame,
    cluster_key: Column,
    salt: str = "split0",
    train_pct: int = TRAIN_PCT,
    val_pct: int = VAL_PCT,
) -> DataFrame:
    """Adds ``cluster`` (the dedup-family key) and ``split`` — a pure
    map stage, zero shuffles."""
    return docs.withColumn("cluster", cluster_key).withColumn(
        "split", split_of(F.col("cluster"), salt, train_pct, val_pct)
    )


def leaky_clusters(assigned: DataFrame) -> DataFrame:
    """Clusters whose members span more than one split: ``cluster,
    n_docs, n_splits``. Empty for cluster-keyed assignment (the
    property the operator exists to guarantee)."""
    return (
        assigned.groupBy("cluster")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.countDistinct("split").cast("long").alias("n_splits"),
        )
        .where(F.col("n_splits") > 1)
    )
