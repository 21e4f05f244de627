"""Trained character-n-gram language identification (Cavnar-Trenkle
family) — the learned counterpart of the heuristic lang-id in
functions/text.py.

Spark-first shape:

- ``char_bigrams``: pure map-side — transform(sequence(...)) +
  substring, exploded; stays in whole-stage codegen.
- ``train_profiles``: ONE corpus-sized aggregate (lang × bigram counts,
  map-side combine collapses to alphabet²×languages rows) + a rank
  window over that tiny table. The profile is BOUNDED by construction
  (top_k per language), so unlike the tf-idf dictionary it is
  legitimately broadcast-able at any corpus size.
- ``classify``: test-doc bigrams join the BROADCAST profile, one
  per-(doc, lang) aggregate, argmax window per doc. Score = number of
  the doc's DISTINCT bigrams present in the language's profile;
  deterministic tie-break (score desc, lang asc).

Documents sharing no bigram with any profile are absent from the
output (no evidence → no prediction), mirrored by the oracle's inner
join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def char_bigrams(df: DataFrame, text_col: str = "text") -> F.Column:
    """Array of overlapping character bigrams of ``text_col``."""
    return F.expr(
        f"transform(sequence(1, length({text_col}) - 1),"
        f" i -> substring({text_col}, i, 2))"
    )


def train_profiles(
    train: DataFrame,
    lang_col: str = "lang",
    text_col: str = "text",
    top_k: int = 20,
) -> DataFrame:
    """(lang, bg) top-k bigram profile per language — bounded state."""
    bg = train.select(
        F.col(lang_col).alias("lang"),
        F.explode(char_bigrams(train, text_col)).alias("bg"),
    )
    counts = bg.groupBy("lang", "bg").agg(F.count(F.lit(1)).alias("c"))
    w = Window.partitionBy("lang").orderBy(F.desc("c"), F.asc("bg"))
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= top_k)
        .select("lang", "bg")
    )


def classify(
    docs: DataFrame,
    profiles: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, pred_lang, score): argmax profile-overlap per document."""
    doc_bg = docs.select(
        F.col(id_col).alias("_id"),
        F.explode(char_bigrams(docs, text_col)).alias("bg"),
    ).distinct()
    scored = (
        doc_bg.join(F.broadcast(profiles), "bg")
        .groupBy("_id", "lang")
        .agg(F.count(F.lit(1)).alias("score"))
    )
    w = Window.partitionBy("_id").orderBy(F.desc("score"), F.asc("lang"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            F.col("_id").alias(id_col),
            F.col("lang").alias("pred_lang"),
            "score",
        )
    )
