"""Temperature-scaled source mixture sampling.

The data-mixing step of a multi-source pre-training corpus: sampling
rates per source are DERIVED from corpus statistics with a temperature
that flattens the natural size distribution (p_s ∝ n_s^(1/τ); the
multilingual-training convention of Conneau & Lample 2019 / mBERT —
head sources are down-weighted, tail sources up-weighted, so one giant
crawl cannot drown out small curated sets). This complements
plans/queries_sampling.q_mixture_weighted, whose rates are hard-coded
policy: here the rates are computed from the data for a target budget.

τ = 2 (α = 1/2) is the classic setting and the one this module
implements exactly in integers: the un-normalized weight is
floor(sqrt(n_s)) — IEEE sqrt of an exact integer is correctly rounded,
so both engines agree bit-for-bit — and everything downstream is
fixed-point PPM arithmetic (BIGINT), never a float ratio.

Spark-first shape: one k-row aggregate (k = number of sources) builds
the rate table; normalization is a window over those k rows; the sample
itself is a broadcast join of the k-row rate table onto the corpus plus
a map-side deterministic hash gate (replayable — same salt, same
sample; new salt, fresh draw). No shuffle touches the corpus beyond
the broadcast-join-free hash filter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

from .sketches import hash60

PPM = 1_000_000


def temperature_rates(
    docs: DataFrame,
    target_ppm: int = PPM // 2,
    source_col: str = "source",
) -> DataFrame:
    """Per-source sampling-rate table for a τ=2 temperature mixture
    sized to ``target_ppm`` (fraction of the corpus, in ppm).

    Columns: ``source, n_docs, w_sqrt, p_ppm, keep_ppm`` where
    ``p_ppm`` is the normalized mixture share (∝ floor(sqrt(n_s))) and
    ``keep_ppm`` the Bernoulli gate rate that realizes it against the
    source's actual size, clamped to 100% (a tail source whose share
    exceeds its size keeps everything — temperature sampling without
    replacement cannot up-sample past 1×; the budget shortfall stays
    with the tail rather than being silently re-spread).
    """
    n = docs.groupBy(source_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs")
    )
    w = n.select(
        source_col,
        "n_docs",
        F.floor(F.sqrt(F.col("n_docs"))).cast("long").alias("w_sqrt"),
    )
    everything = Window.partitionBy()
    # all divisions are integer DIV on non-negative BIGINTs (exact in
    # both engines — float ratios would not be), totals come from a
    # k-row whole-frame window
    with_totals = w.select(
        source_col,
        "n_docs",
        "w_sqrt",
        F.sum("w_sqrt").over(everything).alias("_tw"),
        F.sum("n_docs").over(everything).alias("_tn"),
    )
    return with_totals.selectExpr(
        source_col,
        "n_docs",
        "w_sqrt",
        f"CAST(w_sqrt * {PPM} DIV _tw AS BIGINT) AS p_ppm",
        f"CAST(LEAST({PPM}, (_tn * {target_ppm} DIV {PPM})"
        f" * (w_sqrt * {PPM} DIV _tw) DIV {PPM}"
        f" * {PPM} DIV n_docs) AS BIGINT) AS keep_ppm",
    )


def sql_rates_ctes(
    table: str = "documents", target_ppm: int = PPM // 2
) -> str:
    """DuckDB mirror of :func:`temperature_rates` as CTEs defining
    ``rates`` (source, n_docs, w_sqrt, p_ppm, keep_ppm) — avoid the
    names mx_n/mx_w/mx_tot/rates around it. ``table`` needs
    (doc_id, source)."""
    return f"""
    mx_n AS (
      SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs
      FROM {table} GROUP BY source
    ), mx_w AS (
      SELECT source, n_docs,
             CAST(FLOOR(SQRT(n_docs)) AS BIGINT) AS w_sqrt
      FROM mx_n
    ), mx_tot AS (
      SELECT source, n_docs, w_sqrt,
             CAST(SUM(w_sqrt) OVER () AS BIGINT) AS tw,
             CAST(SUM(n_docs) OVER () AS BIGINT) AS tn
      FROM mx_w
    ), rates AS (
      SELECT source, n_docs, w_sqrt,
             CAST(w_sqrt * {PPM} // tw AS BIGINT) AS p_ppm,
             CAST(LEAST({PPM}, (tn * {target_ppm} // {PPM})
                  * (w_sqrt * {PPM} // tw) // {PPM}
                  * {PPM} // n_docs) AS BIGINT) AS keep_ppm
      FROM mx_tot
    )
"""


def temperature_sample(
    docs: DataFrame,
    target_ppm: int = PPM // 2,
    source_col: str = "source",
    id_col: str = "doc_id",
    salt: str = "mix0",
) -> DataFrame:
    """The realized mixture: keep a document iff its deterministic
    60-bit hash lands under its source's ``keep_ppm`` gate. The rate
    table is k rows → broadcast; the gate is map-side; replaying with
    the same salt reproduces the sample exactly.

    Returns ``(id_col, source_col)`` of the kept documents.
    """
    rates = temperature_rates(docs, target_ppm, source_col)
    h = hash60(F.concat(F.lit(salt + "|"), F.col(id_col).cast("string")))
    return (
        docs.select(id_col, source_col)
        .join(F.broadcast(rates.select(source_col, "keep_ppm")), source_col)
        .where((h % PPM) < F.col("keep_ppm"))
        .select(id_col, source_col)
    )
