"""Bitemporal (valid-time × transaction-time) history reconstruction.

SCD2 (operators/scd.py) tracks ONE timeline: when a value became
effective. Production dimension data has two — when a fact was TRUE
(valid time) and when we LEARNED it (transaction/recorded time) — and
corrections arrive late: an assertion recorded today can rewrite last
week's validity. The bitemporal contract (Snodgrass, "Developing
Time-Oriented Database Applications in SQL"; SQL:2011 system/application
time) is that every past BELIEF stays reconstructible: "what did we
think the history was, as of transaction time T?".

Model: an append-only ASSERTION log (key, val, valid_us, recorded_us,
tie). Reconstruction at knowledge cutoff T:

1. keep assertions with recorded_us <= T (None = all knowledge);
2. per (key, valid_us) the LATEST recording wins — corrections
   supersede by (recorded_us, tie) descending (deterministic);
3. run-collapse the resolved values over valid time into intervals —
   exactly the SCD2 fold, reused shape-for-shape.

Spark-first: both windows partition by key (the resolve window by
(key, valid_us) — a finer key, so it pipelines on the same exchange
after AQE coalescing); everything is whole-stage-codegen window + lag
+ lead. Boundary columns are BIGINT epoch-µs per the repo's TIMESTAMP
discipline. At 100 TB the assertion log partitions by key like any
CDC log; no stage touches more than the key's own assertions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window


def bitemporal_history(
    asserts: DataFrame,
    key_col: str = "user_id",
    val_col: str = "val",
    valid_col: str = "valid_us",
    rec_col: str = "recorded_us",
    tie_col: str = "_tie",
    as_of_us: int | None = None,
) -> DataFrame:
    """Validity history as believed at knowledge cutoff ``as_of_us``
    (None = current knowledge). Columns: ``key_col, val,
    valid_from_us, valid_to_us (NULL = open), version,
    n_superseded`` (corrections this interval's start absorbed)."""
    a = asserts.select(
        key_col,
        F.col(val_col).alias("val"),
        F.col(valid_col).alias("_v"),
        F.col(rec_col).alias("_r"),
        F.col(tie_col).alias("_t"),
    )
    if as_of_us is not None:
        a = a.where(F.col("_r") <= F.lit(int(as_of_us)))
    wr = Window.partitionBy(key_col, "_v").orderBy(
        F.desc("_r"), F.desc("_t")
    )
    resolved = (
        a.withColumn("_rn", F.row_number().over(wr))
        .withColumn(
            "_sup", F.count(F.lit(1)).over(wr.rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )) - 1,
        )
        .where(F.col("_rn") == 1)
        .select(key_col, "val", "_v", "_t", "_sup")
    )
    w = Window.partitionBy(key_col).orderBy("_v", "_t")
    runs = (
        resolved.withColumn("_n", F.row_number().over(w))
        .withColumn("_prev", F.lag("val").over(w))
        .where(
            (F.col("_n") == 1)
            | ~F.col("_prev").eqNullSafe(F.col("val"))
        )
    )
    w2 = Window.partitionBy(key_col).orderBy("_v", "_t")
    return runs.select(
        key_col,
        "val",
        F.col("_v").alias("valid_from_us"),
        F.lead("_v").over(w2).alias("valid_to_us"),
        F.row_number().over(w2).cast("long").alias("version"),
        F.col("_sup").cast("long").alias("n_superseded"),
    )


def sql_bitemporal_ctes(
    source_cte: str,
    key_col: str = "user_id",
    as_of_us: int | None = None,
    prefix: str = "bt",
) -> str:
    """DuckDB mirror as CTEs defining ``{prefix}_hist`` with the same
    columns as :func:`bitemporal_history`. ``source_cte`` must provide
    (key_col, val, valid_us, recorded_us, _tie). Avoid the names
    {prefix}_res/{prefix}_runs/{prefix}_hist around it."""
    cut = (
        f"WHERE recorded_us <= {int(as_of_us)}"
        if as_of_us is not None
        else ""
    )
    p = prefix
    return f"""
    {p}_res AS (
      SELECT {key_col}, val, _v, _t, _sup FROM (
        SELECT {key_col}, val, valid_us AS _v, _tie AS _t,
               ROW_NUMBER() OVER (PARTITION BY {key_col}, valid_us
                 ORDER BY recorded_us DESC, _tie DESC) AS _rn,
               COUNT(*) OVER (PARTITION BY {key_col}, valid_us) - 1
                 AS _sup
        FROM {source_cte} {cut})
      WHERE _rn = 1
    ), {p}_runs AS (
      SELECT * FROM (
        SELECT {key_col}, val, _v, _t, _sup,
               ROW_NUMBER() OVER (PARTITION BY {key_col}
                                  ORDER BY _v, _t) AS _n,
               LAG(val) OVER (PARTITION BY {key_col}
                              ORDER BY _v, _t) AS _prev
        FROM {p}_res)
      WHERE _n = 1 OR _prev IS DISTINCT FROM val
    ), {p}_hist AS (
      SELECT {key_col}, val,
             _v AS valid_from_us,
             LEAD(_v) OVER (PARTITION BY {key_col}
                            ORDER BY _v, _t) AS valid_to_us,
             CAST(ROW_NUMBER() OVER (PARTITION BY {key_col}
                                     ORDER BY _v, _t) AS BIGINT)
               AS version,
             CAST(_sup AS BIGINT) AS n_superseded
      FROM {p}_runs
    )
"""
