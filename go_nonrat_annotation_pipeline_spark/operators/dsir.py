"""DSIR-style importance weighting for training-data selection.

Xie et al. 2023, "Data Selection for Language Models via Importance
Resampling" (arXiv:2302.03169): model a small TARGET corpus and the
RAW pool as bags of hashed n-grams, weight every raw document by how
target-like its n-grams are (ratio of the two models), and keep the
highest-weighted fraction. This is the standard way a pre-training
pipeline skews a 100 TB crawl toward a curated domain without training
a classifier.

Spark-first shape:
- n-gram generation is a single JVM higher-order expression
  (transform(sequence) + slice + concat_ws) — map-side, fuses into the
  scan, no Python;
- both count models are ONE groupBy each on a bucket id bounded by
  ``buckets`` (default 4096) — the hashed feature space from the paper,
  which caps model size regardless of corpus vocabulary;
- scoring joins occurrences to the bucket table with an explicit
  ``F.broadcast`` (the table is ≤ buckets rows by construction — the
  textbook broadcast-dim case) and partial-aggregates per doc;
- selection is a distributed TakeOrdered top-k (per-partition heaps),
  never a global row_number window.

Float discipline (plans/registry.py): the paper's weight is
log(p_target/p_raw) summed per doc — a float aggregate over doubles,
the one class banned at the driver boundary. Instead the weight is the
smoothed count RATIO in parts-per-million, floor-divided:
``wt_ppm = (t_cnt+1)*1_000_000 div (r_cnt+1)`` — exact BIGINT
arithmetic end-to-end, so per-doc sums are order-independent and
bit-identical across engines. The global (R_total/T_total)
normalization constant is omitted: it scales every bucket weight by
the same factor, so per-doc rankings — and therefore the selected set —
are unchanged (the score is a rank statistic, not a probability).
Ratio-sum vs log-ratio-sum changes the blend (arithmetic instead of
geometric mean of per-gram ratios) but keeps the estimator monotone in
each bucket ratio; the deterministic top-fraction step below replaces
the paper's Gumbel-top-k draw the same way the repo's PPS sampler
documents its determinism.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from .sketches import hash60
from .util import ensure_parallelism

DEFAULT_BUCKETS = 4096
PPM = 1_000_000


def word_ngrams(text_col: Column, n: int = 2) -> Column:
    """array<string> of space-joined word n-grams — one JVM expression
    (empty tokens from repeated spaces are dropped first)."""
    toks = F.filter(F.split(text_col, " "), lambda x: x != "")
    if n == 1:
        return toks
    # guard: Spark's sequence(1, 0) yields a DESCENDING [1, 0] (and its
    # 0 then crashes 1-based slice), so docs with fewer than n tokens
    # must short-circuit to an empty array explicitly
    return F.when(
        F.size(toks) < n, F.array().cast("array<string>")
    ).otherwise(
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - (n - 1)),
            lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
        )
    )


def doc_ngram_buckets(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 2,
    buckets: int = DEFAULT_BUCKETS,
) -> DataFrame:
    """(_id, bucket): one row per n-gram OCCURRENCE, bucketed into the
    hashed feature space (hash60 — the repo's cross-engine md5 hash)."""
    return (
        ensure_parallelism(
            df.select(F.col(id_col).alias("_id"), F.col(text_col))
        )
        .select("_id", F.explode(word_ngrams(F.col(text_col), n)).alias("g"))
        .select("_id", (hash60(F.col("g")) % buckets).alias("bucket"))
    )


def dsir_bucket_weights(
    target: DataFrame,
    raw: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 2,
    buckets: int = DEFAULT_BUCKETS,
) -> DataFrame:
    """(bucket, t_cnt, r_cnt, wt_ppm): the two hashed-n-gram count
    models and the smoothed fixed-point importance weight per bucket.
    Two shuffles (one groupBy per corpus), output ≤ ``buckets`` rows —
    the persistable model artifact."""
    t = (
        doc_ngram_buckets(target, id_col, text_col, n, buckets)
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("t_cnt"))
    )
    r = (
        doc_ngram_buckets(raw, id_col, text_col, n, buckets)
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("r_cnt"))
    )
    return (
        t.join(r, "bucket", "full_outer")
        .select(
            "bucket",
            F.coalesce("t_cnt", F.lit(0)).alias("t_cnt"),
            F.coalesce("r_cnt", F.lit(0)).alias("r_cnt"),
        )
        .withColumn(
            "wt_ppm",
            F.expr(f"(t_cnt + 1) * {PPM} DIV (r_cnt + 1)"),
        )
    )


def dsir_scores(
    raw: DataFrame,
    weights: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 2,
    buckets: int = DEFAULT_BUCKETS,
) -> DataFrame:
    """(doc_id, n_grams, score_ppm, norm_ppm): per-doc importance.
    ``norm_ppm`` (score div n_grams — the length-normalized mean bucket
    ratio) is the selection statistic, so long docs don't win by length
    alone. Docs with fewer than ``n`` tokens emit no n-grams and are
    excluded (they carry no evidence either way). The weight table
    joins broadcast; the per-doc aggregate partial-aggregates map-side.
    """
    occ = doc_ngram_buckets(raw, id_col, text_col, n, buckets)
    return (
        occ.join(F.broadcast(weights.select("bucket", "wt_ppm")), "bucket")
        .groupBy(F.col("_id").alias(id_col))
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum("wt_ppm").alias("score_ppm"),
        )
        .withColumn("norm_ppm", F.expr("score_ppm DIV n_grams"))
    )


def dsir_select(
    scored: DataFrame,
    keep_fraction: float,
    id_col: str = "doc_id",
) -> DataFrame:
    """Top ``ceil(keep_fraction * N)`` docs by (norm_ppm desc, id asc) —
    deterministic importance selection, THRESHOLD-based so it scales:
    ``orderBy().limit(k)`` would funnel k ≈ 20% of the corpus through
    TakeOrdered's single merge, so instead the cut value is found on the
    SCORE DISTRIBUTION (one groupBy bounded by the fixed-point ppm value
    domain, never corpus cardinality; its cumulative window runs over
    that small distinct-value table) and the corpus is then FILTERED
    map-side: every row above the threshold plus the lowest-id rows at
    exactly the threshold to land on k. Only the threshold tie-group —
    normally a handful of rows — pays a TakeOrdered."""
    import math

    from pyspark.sql.window import Window

    k = math.ceil(keep_fraction * scored.count())
    if k <= 0:
        return scored.where(F.lit(False)).select(
            id_col, "n_grams", "score_ppm", "norm_ppm"
        )
    dist = scored.groupBy("norm_ppm").agg(F.count(F.lit(1)).alias("c"))
    # unpartitioned window is safe here: dist is value-domain-sized
    cum = dist.withColumn(
        "cum",
        F.sum("c").over(
            # value-domain-sized frame: constant-partition convention
            Window.partitionBy(F.col("norm_ppm") % 1)
            .orderBy(F.desc("norm_ppm"))
            .rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    t_rows = (
        cum.where(F.col("cum") >= k)
        .orderBy(F.desc("norm_ppm"))
        .limit(1)
        .collect()
    )
    if not t_rows:  # keep_fraction ≥ 1: everything qualifies
        return scored.select(id_col, "n_grams", "score_ppm", "norm_ppm")
    t = t_rows[0]
    n_ties = k - (t.cum - t.c)  # rows strictly above the threshold: cum - c
    above = scored.where(F.col("norm_ppm") > t.norm_ppm)
    ties = (
        scored.where(F.col("norm_ppm") == t.norm_ppm)
        .orderBy(F.asc(id_col))
        .limit(int(n_ties))
    )
    return above.unionByName(ties).select(
        id_col, "n_grams", "score_ppm", "norm_ppm"
    )
