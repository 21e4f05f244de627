"""Shared operator utilities."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def ensure_parallelism(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Repartition ONLY if the scan is under-parallelized (e.g. a single
    small parquet file at test SF). At real scale the input already has
    ≥cores partitions and this is a no-op — no extra shuffle.

    The repartition is pinned with a lazy localCheckpoint: Catalyst
    happily pushes downstream projections/filters below a round-robin
    exchange, which would run the caller's expensive per-row compute in
    the single pre-exchange scan task — the checkpoint is a hard barrier
    that keeps post-repartition work on all cores."""
    p = min_partitions or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < p:
        return df.repartition(p).localCheckpoint(eager=False)
    return df


def salted_join(
    facts: DataFrame,
    dim: DataFrame,
    key: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join: salt the fact side's hot keys across
    n_salts sub-partitions and replicate the (small) right side once per
    salt, so one pathological key no longer lands on one reducer.

    AQE's skew-join split handles moderate skew automatically (on in
    session.py); this explicit variant is for the extreme case — e.g.
    exact-dedup content hashes where one boilerplate document dominates
    a 100 TB corpus — or for engines/paths where AQE is unavailable.
    Cost: right side is duplicated n_salts×, so keep it dimension-sized.
    """
    salted_facts = facts.withColumn(
        "_salt", (F.rand(seed=42) * n_salts).cast("int")
    )
    salted_dim = dim.withColumn(
        "_salt",
        F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))),
    )
    return salted_facts.join(salted_dim, [key, "_salt"], how).drop("_salt")


def salted_group_count(facts: DataFrame, key: Column | str, n_salts: int = 16) -> DataFrame:
    """Skew-resistant count per key: two-phase aggregate through a salted
    intermediate key. Spark's hash aggregate already does map-side
    partial aggregation, which solves most count skew; this pattern is
    for aggregates without partial pushdown (e.g. exact distinct-count
    over a skewed key feeding collect_list-style merges)."""
    k = F.col(key) if isinstance(key, str) else key
    partial = (
        facts.select(k.alias("_k"))
        .withColumn("_salt", (F.rand(seed=42) * n_salts).cast("int"))
        .groupBy("_k", "_salt")
        .agg(F.count("*").alias("_c"))
    )
    return (
        partial.groupBy("_k")
        .agg(F.sum("_c").alias("count"))
        .select(F.col("_k").alias(key if isinstance(key, str) else "key"), "count")
    )
