"""Cross-document duplicated-SPAN detection and removal
(exact-substring dedup, Lee et al. 2021, arXiv:2107.06499
"Deduplicating Training Data Makes Language Models Better").

Lee et al. remove every ≥50-token substring that occurs twice in the
corpus, using a suffix array — an inherently single-machine index. The
Spark-first equivalent works at token-shingle granularity: an n-token
span duplicated across documents is exactly a run of n-gram shingles
whose hashes each occur in ≥2 distinct docs, so

1. position-indexed shingle hashes (map-side HOF expressions, the
   functions/hashing kernels);
2. ONE exact doc-frequency aggregate over the shingle hash (distinct
   (shash, doc) pairs, then count — both partial-aggregated);
3. mark shingle START positions whose hash is shared by ≥2 docs
   (semi-join back on the hash — corpus-sized both sides, shuffle hash
   join, the model grows with the corpus so no broadcast);
4. a marked start at position p covers words [p, p+n); per-word
   coverage is a windowed MAX over the last n-1 flags (positions are
   dense, so ROWS frames equal RANGE frames); contiguous covered runs
   merge into maximal spans for free — no gaps-and-islands join.

This differs from boilerplate_strip (fixed non-overlapping chunks,
shared-by->N policy, unit = chunk) in exactly the way Lee et al.
differ from CCNet: spans are position-free rolling windows, the
threshold is ANY cross-doc duplication, and the strip is word-exact at
span boundaries. Within-doc repetition is deliberately out of scope
(q_repetition_ratio's job): the doc-frequency stage counts DISTINCT
docs per shingle.

Scale posture: three linear shuffles (doc-frequency aggregate, the
mark semi-join, the per-doc window/reassembly), each corpus-sized with
map-side partials; nothing pairwise, nothing driver-side. The window
frame is n-wide per word — O(n·words) work, the same constant Lee et
al.'s suffix-array walk pays.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import hashing as H
from .util import ensure_parallelism

N_DEFAULT = 15  # tokens per shingle ≈ the smallest span worth stripping


def positioned_words(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(_id, pos, w): whitespace tokens with dense 0-based positions."""
    return ensure_parallelism(
        df.select(F.col(id_col).alias("_id"), F.col(text_col))
    ).select(
        "_id",
        F.posexplode(
            F.split(F.coalesce(F.col(text_col), F.lit("")), " ")
        ).alias("pos", "w"),
    )


def _coefs(n: int) -> list[int]:
    """Polynomial-hash coefficients 31^(n-1-k) REDUCED mod P: the
    functions/hashing.shingle_hashes literals overflow BIGINT past
    n ≈ 13 (31^14 > 2^63); with coefficients < P every product stays
    under P² ≈ 1e12 and the n-term sum under 2^63 on both engines."""
    return [pow(31, n - 1 - k, H.P) for k in range(n)]


def sql_shingle_hashes(wh_expr: str, n: int) -> str:
    """DuckDB mirror of :func:`_shingle_hashes`."""
    coefs = _coefs(n)
    terms = " + ".join(
        f"LIST_EXTRACT(__wh, i + {k}) * {coefs[k]}" for k in range(n)
    )
    return (
        f"(SELECT CASE WHEN LEN(__wh) >= {n} THEN "
        f"LIST_TRANSFORM(GENERATE_SERIES(1, LEN(__wh) - {n - 1}), "
        f"i -> ({terms}) % {H.P}) "
        f"ELSE [] END FROM (SELECT {wh_expr} AS __wh) __sht)"
    )


def positioned_shingles(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = N_DEFAULT,
) -> DataFrame:
    """(_id, pos, w, shash): every word with the n-gram shingle hash
    STARTING at its 0-based position (NULL within n-1 of the doc end —
    no shingle starts there; docs shorter than n words carry only
    NULLs).

    Shape: the per-word hash is codegen md5/conv on the exploded word
    stream; the shingle combine is n window LEADs over (doc, pos) —
    compiled window exec, ONE pass. The natural alternative (a
    higher-order transform over the word-hash array, the
    functions/hashing.shingle_hashes shape) evaluates its lambda
    INTERPRETED per (position × n) and measured minutes-not-seconds at
    n=15 on a 100k-doc corpus.
    """
    coefs = _coefs(n)
    words = positioned_words(df, id_col, text_col).withColumn(
        "_h", H.char_hash(F.col("w"))
    )
    win = Window.partitionBy("_id").orderBy("pos")
    shash = (
        sum(F.lead("_h", k).over(win) * F.lit(coefs[k]) for k in range(n))
        % F.lit(H.P)
    )
    return words.select("_id", "pos", "w", shash.alias("shash"))


def _covered_words(
    df: DataFrame, id_col: str, text_col: str, n: int
) -> DataFrame:
    """(_id, pos, w, cov): per-word duplicated-span coverage flag."""
    occ = positioned_shingles(df, id_col, text_col, n).localCheckpoint()
    shared = (
        occ.where(F.col("shash").isNotNull())
        .select("shash", "_id")
        .distinct()
        .groupBy("shash")
        .agg(F.count(F.lit(1)).alias("_nd"))
        .where(F.col("_nd") >= 2)
        .select("shash", F.lit(1).alias("_m"))
    )
    win = (
        Window.partitionBy("_id")
        .orderBy("pos")
        .rowsBetween(-(n - 1), Window.currentRow)
    )
    return (
        occ.join(shared, "shash", "left")
        .withColumn("cov", F.max(F.coalesce(F.col("_m"), F.lit(0))).over(win))
        .select("_id", "pos", "w", "cov")
    )


def duplicated_span_mass(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = N_DEFAULT,
) -> DataFrame:
    """(doc_id, n_words, dup_words, n_spans): how much of each document
    sits inside a cross-doc duplicated span — the per-doc signal Lee et
    al. report corpus-wide (and a quality gate input)."""
    cov = _covered_words(df, id_col, text_col, n)
    prev = F.lag("cov", 1, 0).over(
        Window.partitionBy("_id").orderBy("pos")
    )
    flagged = cov.withColumn(
        "_span_start", ((F.col("cov") == 1) & (prev == 0)).cast("long")
    )
    return flagged.groupBy(F.col("_id").alias(id_col)).agg(
        F.count(F.lit(1)).alias("n_words"),
        F.sum("cov").cast("bigint").alias("dup_words"),
        F.sum("_span_start").cast("bigint").alias("n_spans"),
    )


def strip_duplicated_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = N_DEFAULT,
) -> DataFrame:
    """(doc_id, clean_text, n_kept, n_dropped): the corpus REWRITE —
    every word inside a cross-doc duplicated span is removed from ALL
    its carriers; survivors reassemble in original order (order-safe
    array_sort over (pos, w) structs, never a bare collect_list)."""
    cov = _covered_words(df, id_col, text_col, n)
    return cov.groupBy(F.col("_id").alias(id_col)).agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(
                            F.col("cov") == 0,
                            F.struct(F.col("pos"), F.col("w")),
                        )
                    )
                ),
                lambda s: s["w"],
            ),
            " ",
        ).alias("clean_text"),
        F.sum(F.when(F.col("cov") == 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n_kept"),
        F.sum("cov").cast("bigint").alias("n_dropped"),
    )
