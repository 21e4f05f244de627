"""Dataset-construction queries: deterministic train/test split, quota
(stratified) sampling, document chunking, global top-k, and a time-range
window join — the sampling/packing half of a training-data pipeline
(operators/sampling.py; north-star extension, no reference counterpart).
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..operators.sampling import chunk_text, quota_sample, train_test_split
from ..sources.testdata import load_table
from .registry import register


# ---------------------------------------------------------------------------
# Deterministic hash split: pure map-side gate, replayable on any
# cluster size (operators/sampling.py:train_test_split).
# ---------------------------------------------------------------------------
@register(
    "q_train_test_split",
    """
    SELECT split, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM (SELECT CASE WHEN SUBSTR(MD5(CAST(doc_id AS VARCHAR)), 1, 2) <= 'cc'
                      THEN 'train' ELSE 'test' END AS split, n_chars
          FROM documents)
    GROUP BY split
    """,
    doc="deterministic md5-hash train/test split, per-split stats",
)
def q_train_test_split(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return (
        train_test_split(docs, "doc_id", "cc")
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("long").alias("total_chars"),
        )
    )


# ---------------------------------------------------------------------------
# Quota sampling per (source, lang) stratum — balanced-mixture
# construction; md5 ordering makes the sample stable and uniform.
# ---------------------------------------------------------------------------
@register(
    "q_quota_sample",
    """
    SELECT doc_id, source, lang FROM (
      SELECT doc_id, source, lang,
             ROW_NUMBER() OVER (PARTITION BY source, lang
                                ORDER BY MD5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
      FROM documents)
    WHERE rn <= 7
    """,
    doc="stratified quota sample: ≤7 docs per (source, lang) by md5 order",
)
def q_quota_sample(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return quota_sample(docs, ["source", "lang"], "doc_id", 7).select(
        "doc_id", "source", "lang"
    )


# ---------------------------------------------------------------------------
# Overlapping character chunking (context-window packing prep):
# explode(sequence) keeps generation JVM-side, zero shuffle.
# ---------------------------------------------------------------------------
@register(
    "q_doc_chunking",
    """
    SELECT doc_id, CAST(start AS BIGINT) AS chunk_start,
           SUBSTR(text, CAST(start AS INT) + 1, 40) AS chunk
    FROM (SELECT doc_id, text,
                 UNNEST(RANGE(0, CAST(GREATEST(LEN(text) - 1, 0) AS BIGINT) + 1, 30)) AS start
          FROM documents)
    """,
    doc="overlapping 40-char/stride-30 chunking via explode(sequence)",
)
def q_doc_chunking(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    out = chunk_text(docs, "doc_id", "text", chunk_size=40, stride=30)
    return out.select(
        "doc_id", F.col("chunk_start").cast("long").alias("chunk_start"), "chunk"
    )


# ---------------------------------------------------------------------------
# Global top-k: orderBy+limit compiles to TakeOrderedAndProject —
# per-partition heaps + single k-row merge, never a global sort.
# ---------------------------------------------------------------------------
@register(
    "q_global_topk",
    """
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 100
    """,
    doc="global top-100 by price: TakeOrderedAndProject, no full sort",
)
def q_global_topk(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(100)
    )


# ---------------------------------------------------------------------------
# Time-range window join: clicks within the preceding hour of each
# purchase, same user — expressed as ONE range-frame window over the
# unioned event stream (shuffle |events| once on user_id) instead of a
# self-join (which would shuffle twice and explode pairs per hot user).
# ---------------------------------------------------------------------------
@register(
    "q_range_window_count",
    """
    SELECT event_id, user_id, clicks_before FROM (
      SELECT event_id, user_id, event_type,
             CAST(COALESCE(SUM(is_click) OVER (
               PARTITION BY user_id ORDER BY CAST(FLOOR(EPOCH(ts)) AS BIGINT)
               RANGE BETWEEN 3600 PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
               AS clicks_before
      FROM (SELECT event_id, user_id, event_type, ts,
                   CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS is_click
            FROM events))
    WHERE event_type = 'purchase'
    """,
    doc="range join via range-frame window: clicks in [-3600s,-1s) per purchase",
)
def q_range_window_count(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    flagged = ev.select(
        "event_id",
        "user_id",
        "event_type",
        F.col("ts").cast("long").alias("ts_s"),
        F.when(F.col("event_type") == "click", 1).otherwise(0).alias("is_click"),
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("ts_s")
        .rangeBetween(-3600, -1)
    )
    return (
        flagged.withColumn(
            "clicks_before",
            F.coalesce(F.sum("is_click").over(w), F.lit(0)).cast("long"),
        )
        .where(F.col("event_type") == "purchase")
        .select("event_id", "user_id", "clicks_before")
    )


# ---------------------------------------------------------------------------
# Sequence packing (concat-and-chunk): docs stream in stable id order
# per source; each lands in context window floor(preceding_chars/4096).
# One window-function pass per source — the distributed form of the
# sequential greedy packer every training pipeline runs.
# ---------------------------------------------------------------------------
@register(
    "q_sequence_packing",
    """
    SELECT source, window_id,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS window_chars
    FROM (
      SELECT source, n_chars,
             CAST(FLOOR((SUM(n_chars) OVER (PARTITION BY source ORDER BY doc_id
                           ROWS UNBOUNDED PRECEDING) - n_chars) / 4096.0) AS BIGINT)
               AS window_id
      FROM documents)
    GROUP BY source, window_id
    """,
    doc="sequence packing: cumulative-fill 4096-char context windows per source",
)
def q_sequence_packing(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    w = W.partitionBy("source").orderBy("doc_id").rowsBetween(
        W.unboundedPreceding, 0
    )
    start = F.sum("n_chars").over(w) - F.col("n_chars")
    packed = docs.select(
        "source",
        "n_chars",
        F.floor(start / F.lit(4096.0)).cast("long").alias("window_id"),
    )
    return packed.groupBy("source", "window_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").cast("long").alias("window_chars"),
    )


# ---------------------------------------------------------------------------
# Weighted mixture construction: per-source Bernoulli rates (e.g. keep
# 100% of src0, ~50% of src1, ~25% of everything else) through the same
# md5-prefix gate — still a pure map-side projection, still replayable.
# ---------------------------------------------------------------------------
@register(
    "q_mixture_weighted",
    """
    SELECT source, CAST(COUNT(*) AS BIGINT) AS n_kept,
           CAST(SUM(n_chars) AS BIGINT) AS kept_chars
    FROM documents
    WHERE SUBSTR(MD5(CAST(doc_id AS VARCHAR)), 1, 2) <=
          CASE source WHEN 'src0' THEN 'ff' WHEN 'src1' THEN '7f'
               ELSE '3f' END
    GROUP BY source
    """,
    doc="weighted mixture: per-source deterministic keep-rates via md5 gate",
)
def q_mixture_weighted(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    from ..operators.sampling import hash_bucket_hex

    thr = F.when(F.col("source") == "src0", "ff").when(
        F.col("source") == "src1", "7f"
    ).otherwise("3f")
    return (
        docs.where(hash_bucket_hex(F.col("doc_id")) <= thr)
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.sum("n_chars").cast("long").alias("kept_chars"),
        )
    )


# ---------------------------------------------------------------------------
# Chunk-level dedup composite: chunk every doc (zero-shuffle generate),
# then exact-dedup chunks by md5 — the standard pre-training combo
# (boilerplate/navigation chunks collapse across documents). One
# hash-partition shuffle total.
# ---------------------------------------------------------------------------
@register(
    "q_chunk_dedup",
    """
    SELECT CAST(COUNT(*) AS BIGINT) AS n_chunks,
           CAST(COUNT(DISTINCT k) AS BIGINT) AS n_distinct,
           CAST(SUM(CASE WHEN rn = 1 THEN 0 ELSE 1 END) AS BIGINT) AS n_dropped
    FROM (
      SELECT k, ROW_NUMBER() OVER (PARTITION BY k ORDER BY doc_id, chunk_start) AS rn
      FROM (
        SELECT doc_id, start AS chunk_start,
               MD5(SUBSTR(text, CAST(start AS INT) + 1, 40)) AS k
        FROM (SELECT doc_id, text,
                     UNNEST(RANGE(0, CAST(GREATEST(LEN(text) - 1, 0) AS BIGINT) + 1, 30)) AS start
              FROM documents)))
    """,
    doc="chunk-level exact dedup: chunks collapsed by md5, keep-first stats",
)
def q_chunk_dedup(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    chunks = chunk_text(docs, "doc_id", "text", chunk_size=40, stride=30)
    w = W.partitionBy("k").orderBy("doc_id", "chunk_start")
    ranked = chunks.select(
        "doc_id", "chunk_start", F.md5("chunk").alias("k")
    ).withColumn("rn", F.row_number().over(w))
    return ranked.agg(
        F.count(F.lit(1)).alias("n_chunks"),
        F.count_distinct("k").alias("n_distinct"),
        F.sum(F.when(F.col("rn") == 1, 0).otherwise(1)).cast("long").alias(
            "n_dropped"
        ),
    )


# ---------------------------------------------------------------------------
# JSONL sink → source round-trip: the interchange format every corpus
# pipeline speaks. Write is partition-parallel line-delimited JSON; the
# read-back supplies an explicit schema (no inference scan) — the
# round-trip must be lossless, which the plain-documents oracle checks.
# ---------------------------------------------------------------------------
@register(
    "q_jsonl_roundtrip",
    """
    SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           MIN(doc_id) AS min_doc, MAX(doc_id) AS max_doc
    FROM documents GROUP BY lang
    """,
    doc="JSONL sink→source round-trip is lossless (explicit-schema read-back)",
)
def q_jsonl_roundtrip(spark, sf_dir):
    import os
    import tempfile

    docs = load_table(spark, sf_dir, "documents")
    path = os.path.join(tempfile.mkdtemp(prefix="jsonl_rt_"), "docs")
    docs.write.mode("overwrite").json(path)
    back = spark.read.schema(
        "doc_id long, text string, lang string, source string, n_chars long"
    ).json(path)
    return back.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").cast("long").alias("total_chars"),
        F.min("doc_id").alias("min_doc"),
        F.max("doc_id").alias("max_doc"),
    )
