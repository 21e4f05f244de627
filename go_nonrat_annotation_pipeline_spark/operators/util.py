"""Shared operator utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame


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
