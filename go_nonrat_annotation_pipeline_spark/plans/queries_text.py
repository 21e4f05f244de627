"""Text-analysis queries over the `documents` table (north-star
extensions: language-ID, quality scoring, token counting, document
fingerprinting). All JVM-side Spark; oracles share the exact hash/score
arithmetic via the builders in functions/hashing.py and functions/text.py.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..functions import hashing as H
from ..functions import text as TX
from ..operators.util import ensure_parallelism
from ..sources.testdata import load_table
from .registry import register

_WORDS = TX.sql_words("text")


def _docs(spark, sf_dir):
    return ensure_parallelism(load_table(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# token counting: whitespace + BPE-ish regex pre-tokenizer
# ---------------------------------------------------------------------------
@register(
    "text_token_count",
    f"""
    SELECT doc_id,
           LEN({_WORDS}) AS n_ws_tokens,
           LEN(REGEXP_EXTRACT_ALL(text, '{TX.BPE_REGEX}')) AS n_bpe_tokens
    FROM documents
    """,
    doc="text: whitespace + BPE-regex token counts",
)
def text_token_count(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        TX.whitespace_token_count(F.col("text")).alias("n_ws_tokens"),
        TX.bpe_token_count(F.col("text")).alias("n_bpe_tokens"),
    )


# ---------------------------------------------------------------------------
# quality scoring: length / punctuation / stopword-ratio features
# ---------------------------------------------------------------------------
@register(
    "text_quality_score",
    f"""
    SELECT doc_id,
           LENGTH(text) AS n_chars_m,
           LEN({_WORDS}) AS n_tokens,
           ROUND((LENGTH(text) - (LEN({_WORDS}) - 1)) / CAST(LEN({_WORDS}) AS DOUBLE), 6) AS avg_token_len,
           ROUND({TX.sql_stopword_count(_WORDS, TX.STOP_EN)} / CAST(LEN({_WORDS}) AS DOUBLE), 6) AS stopword_ratio,
           ROUND(LEN(REGEXP_EXTRACT_ALL(text, '[^A-Za-z0-9\\s]')) / CAST(LENGTH(text) AS DOUBLE), 6) AS punct_ratio
    FROM documents
    """,
    doc="text: quality features (length, token, stopword, punct ratios)",
)
def text_quality_score(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    feats = TX.quality_features(F.col("text"))
    return docs.select("doc_id", *[c.alias(n) for n, c in feats.items()])


# ---------------------------------------------------------------------------
# language identification: stopword-hit argmax heuristic
# ---------------------------------------------------------------------------
@register(
    "text_lang_id",
    f"""
    SELECT doc_id, lang AS labeled_lang,
           {TX.sql_predicted_lang(_WORDS)} AS predicted_lang
    FROM documents
    """,
    doc="text: stopword-hit language-ID heuristic",
)
def text_lang_id(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        TX.predicted_lang(TX.words(F.col("text"))).alias("predicted_lang"),
    )


# ---------------------------------------------------------------------------
# document fingerprinting: order-sensitive rolling hash over word hashes
# ---------------------------------------------------------------------------
@register(
    "text_fingerprint",
    f"""
    SELECT doc_id,
           {H.sql_rolling_fingerprint(H.sql_word_hashes(_WORDS))} AS fingerprint,
           {H.sql_char_hash("SUBSTR(text, 1, 64)")} AS prefix_hash
    FROM documents
    """,
    doc="text: rolling-hash fingerprint + prefix hash",
)
def text_fingerprint(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    ws = TX.words(F.col("text"))
    return docs.select(
        "doc_id",
        H.rolling_fingerprint(H.word_hashes(ws)).alias("fingerprint"),
        H.char_hash(F.substring("text", 1, 64)).alias("prefix_hash"),
    )


# ---------------------------------------------------------------------------
# corpus_clean_pipeline moved to queries_r4_fixes.py (round 4): the
# average is now an exact integer micro-token value instead of a
# ROUND(AVG(...)) raw double at the driver hash boundary.
# ---------------------------------------------------------------------------


# ---------------------------------------------------------------------------
# n-gram frequency: top-5 word bigrams per language. Bigram generation
# is a higher-order-function expression (transform over an index
# sequence — JVM codegen, no Python); the count + rank is one
# hash-aggregate shuffle + one window shuffle on lang.
# ---------------------------------------------------------------------------
@register(
    "text_ngram_topk",
    """
    SELECT lang, bigram, n FROM (
      SELECT lang, bigram, CAST(COUNT(*) AS BIGINT) AS n,
             ROW_NUMBER() OVER (PARTITION BY lang
                                ORDER BY COUNT(*) DESC, bigram) AS rn
      FROM (SELECT lang, ws[i] || ' ' || ws[i + 1] AS bigram
            FROM (SELECT lang, STRING_SPLIT(text, ' ') AS ws FROM documents),
                 UNNEST(RANGE(1, LEN(ws))) AS t(i))
      GROUP BY lang, bigram)
    WHERE rn <= 5
    """,
    doc="text: top-5 word bigrams per language (HOF n-gram generation)",
)
def text_ngram_topk(spark, sf_dir):
    from pyspark.sql import Window as W

    docs = _docs(spark, sf_dir)
    ws = F.split(F.col("text"), " ")
    # guard: sequence(1, 0) would COUNT DOWN in Spark where DuckDB's
    # RANGE(1, 1) is empty — single-word docs must emit zero bigrams
    idx = F.when(
        F.size(ws) >= 2, F.sequence(F.lit(1), F.size(ws) - 1)
    ).otherwise(F.array().cast("array<int>"))
    bigrams = F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", F.element_at(ws, i), F.element_at(ws, i + 1)
        ),
    )
    exploded = docs.select("lang", F.explode(bigrams).alias("bigram"))
    counted = exploded.groupBy("lang", "bigram").agg(
        F.count(F.lit(1)).alias("n")
    )
    w = W.partitionBy("lang").orderBy(F.desc("n"), F.asc("bigram"))
    return (
        counted.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 5)
        .select("lang", "bigram", "n")
    )
