"""Pointwise-mutual-information collocation mining.

The classic corpus-analysis op (Church & Hanks 1990): rank adjacent
word pairs by how much more often they co-occur than independence
predicts — PMI = log( c(x,y)·N / (c(x)·c(y)) ). Used in training-data
pipelines to audit tokenizer merge candidates, spot boilerplate
phrases, and sanity-check corpus composition.

Exactness discipline: PMI's log is monotone, so ranking by the RATIO
c(x,y)·N / (c(x)·c(y)) in fixed-point ppm is rank-equivalent and
integer-exact in both engines — no floats anywhere (the same
fixed-point trick as jac_ppm / hit_ppm). Overflow-safe:
c_xy·N·10⁶ ≤ N²·10⁶ stays under 2⁶³ for corpora to ~3 billion bigrams
per analysis slice; shard the analysis (per source / per language)
past that.

Shape: ONE exploded word stream (codegen split+posexplode), adjacent
pairs via a per-doc LEAD window, then two hash aggregates (unigrams,
bigrams) and a join of the bigram table against the (much smaller)
unigram table twice. Top-k is a distributed TakeOrdered, not a global
sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

from .dupspan import positioned_words

PPM = 1_000_000


def bigram_pmi(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_count: int = 5,
) -> DataFrame:
    """``w1, w2, n_xy, n_x, n_y, pmi_ratio_ppm`` for adjacent word
    pairs with c(x,y) ≥ min_count. N is the total adjacent-pair count.
    Rank-equivalent to PMI (fixed-point ratio, exact integers)."""
    words = positioned_words(docs, id_col, text_col)
    win = Window.partitionBy("_id").orderBy("pos")
    pairs = (
        words.withColumn("w2", F.lead("w").over(win))
        .where(F.col("w2").isNotNull())
        .select(F.col("w").alias("w1"), "w2")
    )
    big = pairs.groupBy("w1", "w2").agg(
        F.count(F.lit(1)).cast("long").alias("n_xy")
    )
    uni = (
        words.groupBy("w")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    n_total = pairs.count()
    return (
        big.where(F.col("n_xy") >= min_count)
        .join(uni.select(F.col("w").alias("w1"), F.col("n").alias("n_x")), "w1")
        .join(uni.select(F.col("w").alias("w2"), F.col("n").alias("n_y")), "w2")
        .select(
            "w1",
            "w2",
            "n_xy",
            "n_x",
            "n_y",
            F.expr(f"CAST(n_xy * {n_total}L * {PPM}L DIV (n_x * n_y) AS BIGINT)")
            .alias("pmi_ratio_ppm"),
        )
    )


def sql_bigram_pmi_ctes(table: str = "documents", min_count: int = 5) -> str:
    """DuckDB mirror as CTEs defining ``pmi_scored`` (same columns).
    Avoid names pmi_* around it."""
    return f"""
    pmi_ws AS (
      SELECT doc_id, STRING_SPLIT(COALESCE(text, ''), ' ') AS ws
      FROM {table}
    ), pmi_pairs AS (
      -- DuckDB zips parallel UNNESTs positionally: adjacent pairs are
      -- the word list zipped with itself shifted by one
      SELECT UNNEST(LIST_SLICE(ws, 1, LEN(ws) - 1)) AS w1,
             UNNEST(LIST_SLICE(ws, 2, LEN(ws))) AS w2
      FROM pmi_ws
    ), pmi_big AS (
      SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS n_xy
      FROM pmi_pairs GROUP BY w1, w2
    ), pmi_uni AS (
      SELECT w, CAST(COUNT(*) AS BIGINT) AS n
      FROM (SELECT UNNEST(ws) AS w FROM pmi_ws) GROUP BY w
    ), pmi_n AS (
      SELECT CAST(SUM(n_xy) AS BIGINT) AS n_total FROM pmi_big
    ), pmi_scored AS (
      SELECT b.w1, b.w2, b.n_xy, ux.n AS n_x, uy.n AS n_y,
             CAST(b.n_xy * pmi_n.n_total * {PPM}
                  // (ux.n * uy.n) AS BIGINT) AS pmi_ratio_ppm
      FROM pmi_big b
      JOIN pmi_uni ux ON ux.w = b.w1
      JOIN pmi_uni uy ON uy.w = b.w2
      CROSS JOIN pmi_n
      WHERE b.n_xy >= {min_count}
    )
"""
