"""Token-budget water-filling across sources (capped fair share).

The allocation step of mixture construction: a training run has a
global token budget B and each source s can contribute at most cap_s
tokens (what survived curation). Fair share with caps is the classic
water-filling solution — sources below the waterline are fully funded,
the rest are levelled:

    alloc_s = min(cap_s, L)   with L chosen so  Σ alloc_s = min(B, Σcap)

Closed form, no iteration: sort sources by cap ascending; k = the
largest prefix whose members are fully funded, i.e. the largest i with
P_{i-1} + cap_i·(n-i+1) ≤ B (P = prefix capacity sum); then
L = (B - P_k) div (n - k), and the integer remainder r < n-k goes one
token each to the r smallest-capped unfunded sources (deterministic
tie rule: cap, then source name). Everything is BIGINT window/prefix
arithmetic — one dictionary-sized sort, identical in Spark and DuckDB.

This is exact: Σ alloc = min(B, Σcap) to the token, which the
registered query's oracle verifies by hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window


def waterfill(
    caps: DataFrame,
    budget: int,
    source_col: str = "source",
    cap_col: str = "cap",
    alloc_col: str = "alloc",
) -> DataFrame:
    """(source, cap, alloc): capped fair-share allocation of ``budget``.

    ``caps`` is dictionary-sized (one row per source) — the sort window
    is over k rows, never the corpus.
    """
    w = Window.orderBy(cap_col, source_col)
    wall = Window.orderBy(F.lit(1)).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    ranked = (
        caps.select(source_col, F.col(cap_col).cast("long").alias("cap"))
        .withColumn("i", F.row_number().over(w))
        .withColumn("pfx", F.sum("cap").over(w))  # P_i inclusive
        .withColumn("n", F.count(F.lit(1)).over(wall))
    )
    # funded_i ⇔ P_{i-1} + cap_i·(n-i+1) ≤ B
    ranked = ranked.withColumn(
        "funded",
        (F.col("pfx") - F.col("cap"))
        + F.col("cap") * (F.col("n") - F.col("i") + 1)
        <= F.lit(budget),
    )
    kstats = ranked.agg(
        F.coalesce(
            F.max(F.when(F.col("funded"), F.col("i"))), F.lit(0)
        ).alias("k"),
        F.coalesce(
            F.max(F.when(F.col("funded"), F.col("pfx"))), F.lit(0)
        ).alias("pk"),
        F.max("n").alias("nn"),
    )
    out = ranked.crossJoin(F.broadcast(kstats)).withColumn(
        "_lvl",
        F.when(
            F.col("nn") > F.col("k"),
            F.expr(f"({budget} - pk) DIV (nn - k)"),
        ).otherwise(F.lit(0)),
    ).withColumn(
        "_rem",
        F.when(
            F.col("nn") > F.col("k"),
            F.expr(f"({budget} - pk) % (nn - k)"),
        ).otherwise(F.lit(0)),
    )
    return out.select(
        source_col,
        "cap",
        F.when(F.col("funded"), F.col("cap"))
        .otherwise(
            F.least(
                F.col("cap"),  # guard: level may exceed an unfunded cap
                F.col("_lvl")
                + F.when(
                    F.col("i") - F.col("k") <= F.col("_rem"), F.lit(1)
                ).otherwise(F.lit(0)),
            )
        )
        .cast("long")
        .alias(alloc_col),
    )


def sql_waterfill_ctes(
    caps_cte: str,
    budget: int,
    source_col: str = "source",
) -> str:
    """DuckDB mirror as CTEs defining ``wf_alloc`` (source, cap,
    alloc). ``caps_cte`` must provide (source, cap BIGINT). Avoid
    names wf_* around it."""
    return f"""
    wf_ranked AS (
      SELECT {source_col} AS source, cap,
             ROW_NUMBER() OVER (ORDER BY cap, {source_col}) AS i,
             SUM(cap) OVER (ORDER BY cap, {source_col}
                 ROWS UNBOUNDED PRECEDING) AS pfx,
             COUNT(*) OVER () AS n
      FROM {caps_cte}
    ), wf_f AS (
      SELECT *,
             (pfx - cap) + cap * (n - i + 1) <= {budget} AS funded
      FROM wf_ranked
    ), wf_k AS (
      SELECT COALESCE(MAX(CASE WHEN funded THEN i END), 0) AS k,
             COALESCE(MAX(CASE WHEN funded THEN pfx END), 0) AS pk,
             MAX(n) AS nn
      FROM wf_f
    ), wf_alloc AS (
      SELECT f.source, CAST(f.cap AS BIGINT) AS cap,
             CAST(CASE WHEN f.funded THEN f.cap
                  ELSE LEAST(
                    f.cap,
                    (CASE WHEN s.nn > s.k
                          THEN ({budget} - s.pk) // (s.nn - s.k)
                          ELSE 0 END)
                    + (CASE WHEN f.i - s.k <=
                            (CASE WHEN s.nn > s.k
                                  THEN ({budget} - s.pk) % (s.nn - s.k)
                                  ELSE 0 END)
                            THEN 1 ELSE 0 END))
                  END AS BIGINT) AS alloc
      FROM wf_f f, wf_k s
    )"""
