"""Per-group quality calibration and curriculum layout.

Raw quality scores are not comparable across sources: a threshold tuned
on a clean wiki-like source rejects most of a noisy crawl (or keeps all
of it). The standard fix is to calibrate WITHIN each source — convert
scores to per-source rank percentiles and select by percentile, so
every source contributes its own best slice (the per-domain filtering
posture of CCNet/RefinedWeb-style pipelines). A curriculum layout then
orders training data easiest/cleanest-first by percentile bucket while
keeping intra-bucket order hash-random.

Everything is exact integer arithmetic: the percentile is the rank
percentile pct_ppm = (rank-1)·10⁶ ÷ (n-1) over a deterministic
(score, id) ordering — no float quantile estimation, no approx
percentile sketch, bit-identical across engines.

Spark-first shape: the score is map-side; percentile is one keyed
window per source; the curriculum layout partitions by (bucket, shard)
so no window task ever sees more than 1/(buckets·shards) of the corpus
— the same decorrelation trick operators/shards.py uses, never a
global ORDER BY.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

from .sketches import hash60
from .util import ensure_parallelism

PPM = 1_000_000


def diversity_score(text_col: str = "text") -> F.Column:
    """Lexical-diversity quality score in ppm: distinct whitespace
    tokens over total tokens (boilerplate and loops score low). Pure
    map-side; mirror: LEN(LIST_DISTINCT(toks))*10⁶ // LEN(toks)."""
    toks = F.filter(F.split(F.col(text_col), " "), lambda x: x != "")
    # floor of the double quotient is exact here: numerator ≤ 1e12 and
    # denominator ≤ 1e6 are both exactly representable, and a correctly
    # rounded double division of such ints cannot cross an integer
    # boundary — so this matches DuckDB's integer // bit-for-bit
    return F.floor(
        F.size(F.array_distinct(toks)).cast("long")
        * F.lit(PPM)
        / F.size(toks).cast("long")
    ).cast("long")


def rank_percentile_by_group(
    docs: DataFrame,
    group_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-group rank percentile of the diversity score.

    Columns: ``id_col, group_col, score_ppm, pct_ppm`` where pct_ppm is
    (rank-1)·10⁶ ÷ (n-1) under the deterministic (score, id) ordering
    (0 for a singleton group). Empty documents are excluded (their
    score is undefined)."""
    toks = F.filter(F.split(F.col(text_col), " "), lambda x: x != "")
    base = (
        ensure_parallelism(docs.select(id_col, group_col, text_col))
        .where(F.size(toks) > 0)
        .select(
            id_col,
            group_col,
            diversity_score(text_col).alias("score_ppm"),
        )
    )
    w = Window.partitionBy(group_col).orderBy("score_ppm", id_col)
    wg = Window.partitionBy(group_col)
    return base.select(
        id_col,
        group_col,
        "score_ppm",
        F.row_number().over(w).alias("_r"),
        F.count(F.lit(1)).over(wg).alias("_n"),
    ).selectExpr(
        id_col,
        group_col,
        "score_ppm",
        f"CAST(CASE WHEN _n > 1 THEN (_r - 1) * {PPM} DIV (_n - 1)"
        " ELSE 0 END AS BIGINT) AS pct_ppm",
    )


def top_fraction_per_group(
    docs: DataFrame,
    keep_ppm: int = 250_000,
    group_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """The calibrated selection: each group's top ``keep_ppm`` fraction
    by score percentile — every source contributes its own best slice
    regardless of the sources' absolute score ranges."""
    p = rank_percentile_by_group(docs, group_col, id_col, text_col)
    return p.where(F.col("pct_ppm") >= PPM - keep_ppm).select(
        id_col, group_col, "score_ppm", "pct_ppm"
    )


def curriculum_layout(
    docs: DataFrame,
    n_buckets: int = 10,
    n_shards: int = 8,
    group_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
    salt: str = "cur0",
) -> DataFrame:
    """Curriculum training order: percentile bucket (9 = cleanest
    decile, consumed first) → shard → hash position. Deterministic and
    replayable; no window sees more than 1/(buckets·shards) of the
    corpus. Columns: ``id_col, bucket, shard, pos``."""
    p = rank_percentile_by_group(docs, group_col, id_col, text_col)
    h = hash60(F.concat(F.lit(salt + "|"), F.col(id_col).cast("string")))
    laid = p.select(
        id_col,
        F.least(
            F.lit(n_buckets - 1).cast("long"),
            F.expr(f"pct_ppm * {n_buckets} DIV {PPM}"),
        ).alias("bucket"),
        h.alias("_h"),
        (h % n_shards).alias("shard"),
    )
    w = Window.partitionBy("bucket", "shard").orderBy("_h", id_col)
    return laid.select(
        id_col,
        "bucket",
        F.col("shard").cast("long").alias("shard"),
        F.row_number().over(w).cast("long").alias("pos"),
    )


def sql_percentile_ctes(table: str = "documents") -> str:
    """DuckDB mirror of :func:`rank_percentile_by_group` as CTEs
    defining ``pctl`` (avoid scores/pctl around it)."""
    return f"""
    scores AS (
      SELECT doc_id, source,
             CAST(LEN(LIST_DISTINCT(LIST_FILTER(STRING_SPLIT(text, ' '),
                                                x -> x <> ''))) * {PPM}
                  // LEN(LIST_FILTER(STRING_SPLIT(text, ' '),
                                     x -> x <> '')) AS BIGINT)
               AS score_ppm
      FROM {table}
      WHERE LEN(LIST_FILTER(STRING_SPLIT(text, ' '), x -> x <> '')) > 0
    ), pctl AS (
      SELECT doc_id, source, score_ppm,
             CAST(CASE WHEN COUNT(*) OVER (PARTITION BY source) > 1
                  THEN (ROW_NUMBER() OVER (PARTITION BY source
                                           ORDER BY score_ppm, doc_id)
                        - 1) * {PPM}
                       // (COUNT(*) OVER (PARTITION BY source) - 1)
                  ELSE 0 END AS BIGINT) AS pct_ppm
      FROM scores
    )
"""
