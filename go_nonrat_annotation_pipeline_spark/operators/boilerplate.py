"""Corpus-level boilerplate removal (CCNet-style chunk-hash dedup with
document reassembly).

Wenzek et al. 2020 ("CCNet: Extracting high quality monolingual
datasets from web crawl data", arXiv:1911.00359) deduplicate crawls at
the PARAGRAPH level: a paragraph whose hash appears in many documents
is navigation/boilerplate and is stripped from every document that
carries it, while the documents themselves survive. The synthetic
corpus is a single-line word stream, so the unit here is a fixed-size
token chunk instead of a newline paragraph — same operator shape, same
scale posture (the existing q_chunk_dedup query counts duplicate
chunks; this operator actually REWRITES the corpus).

Spark-first shape, three bounded shuffles end-to-end:
1. chunking is one JVM higher-order expression (posexplode of
   transform(sequence) + slice) — map-side;
2. the chunk-frequency model is ONE groupBy on the chunk hash with
   approx nothing — exact COUNT(DISTINCT doc) per chunk via a
   two-level aggregate (distinct pairs first, then count), both
   partial-aggregated;
3. the verdict joins back on the chunk hash (corpus-sized on both
   sides — a shuffle hash join; no broadcast, the model grows with the
   corpus) and documents reassemble with ONE groupBy(doc) using
   array_sort over (pos, chunk) structs — never an order-dependent
   collect_list.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from .util import ensure_parallelism


def token_chunks(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int = 3,
) -> DataFrame:
    """(_id, pos, chunk): consecutive non-overlapping ``chunk_tokens``
    windows of the whitespace token stream (the trailing partial chunk
    is kept — dropping it would delete document tails)."""
    toks = F.filter(F.split(F.col(text_col), " "), lambda x: x != "")
    n_chunks = F.ceil(F.size(toks) / F.lit(chunk_tokens)).cast("int")
    # guard: Spark's sequence(0, -1) yields a DESCENDING [0, -1], not
    # an empty array, so token-less docs must short-circuit explicitly
    # (they then emit no chunk rows and are absent downstream — the
    # no-evidence contract boilerplate_strip documents)
    chunks: Column = F.when(
        F.size(toks) == 0, F.array().cast("array<string>")
    ).otherwise(
        F.transform(
            F.sequence(F.lit(0), n_chunks - 1),
            lambda j: F.concat_ws(
                " ", F.slice(toks, j * chunk_tokens + 1, chunk_tokens)
            ),
        )
    )
    return ensure_parallelism(
        df.select(F.col(id_col).alias("_id"), F.col(text_col))
    ).select(
        "_id", F.posexplode(chunks).alias("pos", "chunk")
    )


def chunk_doc_freq(chunks: DataFrame) -> DataFrame:
    """(chunk, n_docs): in how many DISTINCT documents each chunk
    occurs. Exact, two partial-aggregated stages (distinct pairs, then
    count) — a chunk repeated within one doc counts once."""
    return (
        chunks.select("chunk", "_id")
        .distinct()
        .groupBy("chunk")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


def boilerplate_strip(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int = 3,
    max_docs: int = 3,
) -> DataFrame:
    """(doc_id, clean_text, n_kept, n_dropped): every chunk occurring in
    more than ``max_docs`` distinct documents is stripped from ALL of
    them; survivors reassemble in original order. Documents whose every
    chunk was boilerplate survive with empty text (dropping them is a
    separate policy decision — compose with a filter)."""
    chunks = token_chunks(df, id_col, text_col, chunk_tokens)
    freq = chunk_doc_freq(chunks)
    judged = chunks.join(freq, "chunk").withColumn(
        "keep", F.col("n_docs") <= F.lit(max_docs)
    )
    return (
        judged.groupBy(F.col("_id").alias(id_col))
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                F.col("keep"),
                                F.struct(F.col("pos"), F.col("chunk")),
                            )
                        )
                    ),
                    lambda s: s["chunk"],
                ),
                " ",
            ).alias("clean_text"),
            F.sum(F.when(F.col("keep"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_kept"),
            F.sum(F.when(F.col("keep"), 0).otherwise(1))
            .cast("bigint")
            .alias("n_dropped"),
        )
    )
