"""Language-model quality scoring and corpus-distribution monitoring.

The CCNet recipe (Wenzek et al., LREC 2020) ranks web documents by the
perplexity of a language model trained on a trusted corpus, then keeps
the low-perplexity "head" of the distribution. The reference pipeline
has no learned scoring; this module adds the Spark-native analogue a
training-data pipeline needs, at char-bigram granularity so training is
ONE bounded aggregate (alphabet² rows) rather than a neural fit:

- ``train_bigram_lm``: add-one-smoothed char-bigram model from a
  trusted split. Output is alphabet²-bounded → broadcast-able at any
  corpus size, like the lang-id profiles (operators/langid.py).
- ``score_cross_entropy``: per-document average negative log-likelihood
  under the model, then fixed-threshold head/middle/tail buckets.
  Per-bigram log terms are computed ONCE on the model side as a single
  ``LN(ratio-of-exact-integers)`` so both engines produce bit-identical
  term values; only the final per-doc average is rounded (same
  discipline as tf-idf, plans/queries_retrieval.py).
- ``oov_stats``: per-source vocabulary coverage of an eval split
  against the train-split token vocabulary — all-integer output
  (counts + permille), hash-safe by construction.
- ``mixture_drift_kl``: per-source KL-divergence contributions between
  two corpus snapshots (add-one-smoothed proportions) — the mixture
  drift monitor a recurring ingestion pipeline alerts on.

Scale posture: the bigram LM and the per-source mixture tables are
bounded (alphabet², #sources); the only corpus-sized shuffles are the
per-doc aggregates and the token-vocabulary join, which is the same
unbounded-dictionary shuffle shape as tf-idf/rare-token (deliberately
NOT broadcast — the vocab grows with the corpus).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .langid import char_bigrams

_LM_SMOOTH = 1  # add-one smoothing on bigram counts


def _doc_bigram_counts(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(_id, bg, c): per-document char-bigram multiplicities.

    Guards the length-1 / empty case: Spark's sequence(1, 0) yields a
    DESCENDING two-element array, not an empty one (see verify notes).
    """
    bigrams = F.when(
        F.length(F.col(text_col)) < 2, F.array().cast("array<string>")
    ).otherwise(char_bigrams(docs, text_col))
    return (
        docs.select(F.col(id_col).alias("_id"), F.explode(bigrams).alias("bg"))
        .groupBy("_id", "bg")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def train_bigram_lm(train: DataFrame, text_col: str = "text") -> dict:
    """Fit the add-one-smoothed char-bigram LM on the trusted split.

    Returns ``{"bg": DataFrame(bg, cnt2), "c1": DataFrame(c1, cnt1),
    "v": int}`` where cnt1 sums bigram occurrences by first char and
    ``v`` is the count of distinct second chars (the smoothing
    vocabulary). Both tables are alphabet-bounded → broadcast.
    """
    bigrams = F.when(
        F.length(F.col(text_col)) < 2, F.array().cast("array<string>")
    ).otherwise(char_bigrams(train, text_col))
    bg = train.select(F.explode(bigrams).alias("bg"))
    bg_counts = bg.groupBy("bg").agg(F.count(F.lit(1)).alias("cnt2"))
    c1_counts = (
        bg_counts.groupBy(F.substring("bg", 1, 1).alias("c1"))
        .agg(F.sum("cnt2").alias("cnt1"))
    )
    v = bg_counts.select(F.substring("bg", 2, 1).alias("c2")).distinct().count()
    return {"bg": bg_counts, "c1": c1_counts, "v": v}


def score_cross_entropy(
    docs: DataFrame,
    lm: dict,
    head_below: float,
    tail_from: float,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, n_bigrams, ce, bucket): avg -ln p(bigram) per document.

    ``ce`` = ROUND(Σ c·ln((cnt1+V)/(cnt2+1)) / Σ c, 6) — the log term is
    one LN over a ratio of exact integers, so per-term doubles are
    bit-identical cross-engine; rounding only the final average absorbs
    summation-order noise (the tf-idf discipline). Unseen bigram →
    cnt2 = 0; unseen first char → cnt1 = 0 (term ln(V)). Documents with
    no bigrams (length < 2) are absent (no evidence → no score).
    """
    v = int(lm["v"])
    doc_bg = _doc_bigram_counts(docs, id_col, text_col)
    joined = (
        doc_bg.withColumn("c1", F.substring("bg", 1, 1))
        .join(F.broadcast(lm["bg"]), "bg", "left")
        .join(F.broadcast(lm["c1"]), "c1", "left")
        .withColumn(
            "term",
            F.log(
                (F.coalesce(F.col("cnt1"), F.lit(0)) + F.lit(v))
                / (F.coalesce(F.col("cnt2"), F.lit(0)) + F.lit(_LM_SMOOTH))
            ),
        )
    )
    scored = joined.groupBy("_id").agg(
        F.sum("c").alias("n_bigrams"),
        F.round(F.sum(F.col("c") * F.col("term")) / F.sum("c"), 6).alias("ce"),
    )
    return scored.select(
        F.col("_id").alias(id_col),
        "n_bigrams",
        "ce",
        F.when(F.col("ce") < head_below, F.lit("head"))
        .when(F.col("ce") < tail_from, F.lit("middle"))
        .otherwise(F.lit("tail"))
        .alias("bucket"),
    )


def oov_stats(
    train: DataFrame,
    eval_df: DataFrame,
    source_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """(source, n_tokens, n_oov, oov_permille): eval-split coverage of
    the train-split whitespace-token vocabulary, per source.

    All-integer output. The vocab join is the unbounded-dictionary
    shuffle shape (tf-idf skeleton) — no broadcast hint on purpose.
    """
    vocab = (
        train.select(F.explode(F.split(F.col(text_col), " ")).alias("term"))
        .distinct()
        .withColumn("known", F.lit(1))
    )
    toks = eval_df.select(
        F.col(source_col).alias("source"),
        F.explode(F.split(F.col(text_col), " ")).alias("term"),
    )
    return (
        toks.join(vocab, "term", "left")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(F.when(F.col("known").isNull(), 1).otherwise(0)).alias(
                "n_oov"
            ),
        )
        .select(
            "source",
            "n_tokens",
            "n_oov",
            F.floor(F.col("n_oov") * 1000 / F.col("n_tokens"))
            .cast("int")
            .alias("oov_permille"),
        )
    )


def mixture_drift_kl(
    ref: DataFrame, cur: DataFrame, source_col: str = "source"
) -> DataFrame:
    """(source, ref_n, cur_n, kl_contrib): per-source add-one-smoothed
    KL(ref‖cur) contributions between two corpus snapshots.

    p = (ref_n+1)/(ref_total+S), q = (cur_n+1)/(cur_total+S) with S the
    union source count; contrib = ROUND(p·ln(p/q), 6). One bounded
    aggregate per snapshot + a full outer join on the tiny source
    dimension — no corpus-sized shuffle beyond the two counts.
    """
    ref_counts = ref.groupBy(F.col(source_col).alias("source")).agg(
        F.count(F.lit(1)).alias("ref_n")
    )
    cur_counts = cur.groupBy(F.col(source_col).alias("source")).agg(
        F.count(F.lit(1)).alias("cur_n")
    )
    both = (
        ref_counts.join(cur_counts, "source", "full_outer")
        .select(
            "source",
            F.coalesce("ref_n", F.lit(0)).alias("ref_n"),
            F.coalesce("cur_n", F.lit(0)).alias("cur_n"),
        )
    )
    # Totals and source count are scalars of a bounded table: safe to
    # fold into the plan via crossJoin of a 1-row aggregate.
    totals = both.agg(
        F.sum("ref_n").alias("ref_total"),
        F.sum("cur_n").alias("cur_total"),
        F.count(F.lit(1)).alias("s"),
    )
    p = (F.col("ref_n") + 1) / (F.col("ref_total") + F.col("s"))
    q = (F.col("cur_n") + 1) / (F.col("cur_total") + F.col("s"))
    return (
        both.crossJoin(F.broadcast(totals))
        .select(
            "source",
            "ref_n",
            "cur_n",
            F.round(p * F.log(p / q), 6).alias("kl_contrib"),
        )
    )
