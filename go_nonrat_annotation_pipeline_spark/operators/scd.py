"""Slowly-changing-dimension (SCD Type 2) builds from an event log.

The warehouse counterpart of CDC: given an append-only event stream
carrying an entity key and a tracked attribute, produce the versioned
dimension table — one row per consecutive RUN of an attribute value,
with ``valid_from/valid_to`` interval bounds, a per-entity version
number, and an ``is_current`` flag on the open interval. This is the
read-side twin of the repo's snapshot-diff CDC (operators/diff.py):
diff derives changes between two materialized states; SCD2 derives the
full validity history from the raw log in one pass.

Spark-first shape: ONE shuffle (hash partition by entity key for the
per-key ordered windows); run-collapse is lag + filter, interval bounds
are lead, version numbers a row_number — all whole-stage-codegen window
functions over the same window spec, so Catalyst evaluates them in a
single WindowExec after a single sort. Per-key ordering is
(ts, event_id) — event_id tiebreaks equal timestamps deterministically.

All boundary columns are BIGINT epoch-µs (the repo's TIMESTAMP
discipline: the driver's typed hash treats timestamps as their own
class, so intervals ship as integers; ``valid_to_us`` is NULL on the
open/current version).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window


def scd2_history(
    events: DataFrame,
    key_col: str = "user_id",
    attr_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Versioned dimension history: one row per consecutive run of
    ``attr_col`` per ``key_col``.

    Columns: ``key, attr, valid_from_us, valid_to_us (NULL=open),
    version (1-based per key), is_current``.
    """
    us = F.unix_micros(F.col(ts_col))
    base = events.select(
        key_col,
        F.col(attr_col).alias("attr"),
        us.alias("ts_us"),
        F.col(id_col).alias("_tie"),
    )
    # Null-safe run collapse: lag(attr) is NULL both for "no previous
    # row" and "previous attr is NULL", so first-row detection rides an
    # explicit row_number and attr comparison is null-safe — a NULL
    # tracked attribute is a legal value that forms runs like any other
    # (and the streaming twin's open-state merge stays exactly
    # batch-equivalent, scd_stream.py).
    w = Window.partitionBy(key_col).orderBy("ts_us", "_tie")
    runs = (
        base.withColumn("_rn", F.row_number().over(w))
        .withColumn("_prev", F.lag("attr").over(w))
        .where(
            (F.col("_rn") == 1)
            | ~F.col("_prev").eqNullSafe(F.col("attr"))
        )
    )
    # run starts only; bounds + version over the SAME window spec
    w2 = Window.partitionBy(key_col).orderBy("ts_us", "_tie")
    return (
        runs.select(
            key_col,
            "attr",
            F.col("ts_us").alias("valid_from_us"),
            F.lead("ts_us").over(w2).alias("valid_to_us"),
            F.row_number().over(w2).cast("long").alias("version"),
        )
        .withColumn(
            "is_current",
            F.when(F.col("valid_to_us").isNull(), F.lit(1))
            .otherwise(F.lit(0))
            .cast("long"),
        )
    )


def scd2_current(
    events: DataFrame,
    key_col: str = "user_id",
    attr_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """The dimension's latest state: exactly one row per key — the open
    interval of :func:`scd2_history`, plus how many versions preceded
    it (churn signal). Same single shuffle as the history build."""
    h = scd2_history(events, key_col, attr_col, ts_col, id_col)
    return h.where(F.col("is_current") == 1).select(
        key_col,
        "attr",
        "valid_from_us",
        F.col("version").alias("n_versions"),
    )


def sql_scd2_history_ctes(
    table: str = "events",
    key_col: str = "user_id",
    attr_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> str:
    """DuckDB mirror of :func:`scd2_history` as CTEs defining ``scd``
    (avoid the names base/runs/scd around it)."""
    return f"""
    base AS (
      SELECT {key_col},
             {attr_col} AS attr,
             CAST(epoch_us({ts_col}) AS BIGINT) AS ts_us,
             {id_col} AS _tie
      FROM {table}
    ), runs AS (
      SELECT * FROM (
        SELECT {key_col}, attr, ts_us, _tie,
               ROW_NUMBER() OVER (PARTITION BY {key_col}
                                  ORDER BY ts_us, _tie) AS _rn,
               LAG(attr) OVER (PARTITION BY {key_col}
                               ORDER BY ts_us, _tie) AS _prev
        FROM base)
      WHERE _rn = 1 OR _prev IS DISTINCT FROM attr
    ), scd AS (
      SELECT {key_col}, attr,
             ts_us AS valid_from_us,
             LEAD(ts_us) OVER (PARTITION BY {key_col}
                               ORDER BY ts_us, _tie) AS valid_to_us,
             CAST(ROW_NUMBER() OVER (PARTITION BY {key_col}
                                     ORDER BY ts_us, _tie) AS BIGINT)
               AS version
      FROM runs
    )
"""
