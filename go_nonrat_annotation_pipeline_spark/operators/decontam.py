"""Benchmark decontamination: flag training documents sharing long
word n-grams with an evaluation/benchmark set.

The standard pre-training hygiene step (GPT-3 appendix C "dirty"
13-gram collision rule; Dodge et al. 2021 C4 benchmark-overlap audit):
any training document that shares at least ``min_hits`` distinct
n-grams with ANY benchmark document is contaminated and must be
dropped (or quarantined for review) before training, or downstream
eval numbers are inflated.

Spark-first shape, sized for the real asymmetry of the problem — the
benchmark side is tiny (eval suites: 10³-10⁵ docs) while the corpus is
the 100 TB side:

- benchmark grams: one aggregate producing a DISTINCT gram-hash set,
  **broadcast** to every executor — the corpus side never shuffles for
  the membership probe;
- corpus grams: the dupspan window-LEAD shingle stream (codegen md5 +
  n window LEADs per doc — NOT the interpreted higher-order-function
  form, the round-6 lesson), de-dupped per doc, probed against the
  broadcast set, then ONE per-doc hash aggregate (map-side partial);
- verdicts are per-doc counters: grams, hits, fixed-point hit_ppm —
  exact integers in both engines;
- ``decontaminate`` is a broadcast ``left_anti`` against the (small)
  contaminated-id set.

Hash discipline: gram hashes use the repo's shared md5/mod-P
convention (functions/hashing, P ≈ 2^20) so the DuckDB oracle matches
bit-for-bit. At real corpus scale P-collisions would flag innocent
docs (~1e-6 per gram pair); production raises the modulus (the
coefficients in operators/dupspan._coefs are modulus-parametric) —
collisions only ever ADD false positives, never let contamination
through, the safe direction for this gate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from . import dupspan as DS

N_DEFAULT = 8
PPM = 1_000_000


def _doc_grams(df: DataFrame, id_col: str, text_col: str, n: int) -> DataFrame:
    """(_id, shash): each document's DISTINCT n-gram hashes."""
    return (
        DS.positioned_shingles(df, id_col, text_col, n)
        .where(F.col("shash").isNotNull())
        .select("_id", "shash")
        .distinct()
    )


def benchmark_grams(
    bench: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = N_DEFAULT,
) -> DataFrame:
    """The benchmark's distinct gram-hash set (column ``shash``) —
    small by construction; callers broadcast it."""
    return _doc_grams(bench, id_col, text_col, n).select("shash").distinct()


def contamination_verdicts(
    docs: DataFrame,
    bench: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = N_DEFAULT,
    min_hits: int = 1,
) -> DataFrame:
    """Per corpus document: ``id_col, n_grams, n_hits, hit_ppm,
    contaminated`` (contaminated ⟺ n_hits ≥ min_hits). Docs shorter
    than n words carry n_grams = 0 and are clean by definition."""
    occ = _doc_grams(docs, id_col, text_col, n)
    bg = F.broadcast(
        benchmark_grams(bench, id_col, text_col, n).withColumn(
            "_m", F.lit(1).cast("long")
        )
    )
    agg = (
        occ.join(bg, "shash", "left")
        .groupBy("_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_grams"),
            F.coalesce(F.sum("_m"), F.lit(0)).cast("long").alias("n_hits"),
        )
    )
    # docs with zero grams (shorter than n words) never reach `agg`;
    # restore them as clean rows so the verdict table covers the corpus
    base = docs.select(F.col(id_col).alias("_id")).distinct()
    return (
        base.join(agg, "_id", "left")
        .select(
            F.col("_id").alias(id_col),
            F.coalesce("n_grams", F.lit(0)).cast("long").alias("n_grams"),
            F.coalesce("n_hits", F.lit(0)).cast("long").alias("n_hits"),
            F.expr(f"COALESCE(n_hits, 0) * {PPM} DIV "
                   f"GREATEST(COALESCE(n_grams, 0), 1)")
            .cast("long")
            .alias("hit_ppm"),
            (F.coalesce("n_hits", F.lit(0)) >= min_hits).alias("contaminated"),
        )
    )


def decontaminate(
    docs: DataFrame,
    bench: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = N_DEFAULT,
    min_hits: int = 1,
) -> DataFrame:
    """The corpus minus contaminated documents — broadcast left_anti
    on the (small) contaminated-id set."""
    bad = (
        contamination_verdicts(docs, bench, id_col, text_col, n, min_hits)
        .where("contaminated")
        .select(id_col)
    )
    return docs.join(F.broadcast(bad), id_col, "left_anti")


def sql_decontam_ctes(
    corpus_table: str,
    bench_table: str,
    n: int = N_DEFAULT,
    min_hits: int = 1,
) -> str:
    """DuckDB mirror as CTEs defining ``dc_verdicts`` (doc_id, n_grams,
    n_hits, hit_ppm, contaminated). ``corpus_table`` / ``bench_table``
    must expose (doc_id, text). Avoid names dc_* around it."""
    import go_nonrat_annotation_pipeline_spark.functions.hashing as H

    sh = DS.sql_shingle_hashes(
        H.sql_word_hashes("STRING_SPLIT(COALESCE(text, ''), ' ')"), n
    )
    return f"""
    dc_occ AS (
      SELECT doc_id, UNNEST(LIST_DISTINCT({sh})) AS shash
      FROM {corpus_table}
    ), dc_bench AS (
      SELECT DISTINCT UNNEST(LIST_DISTINCT({sh})) AS shash
      FROM {bench_table}
    ), dc_agg AS (
      SELECT o.doc_id,
             CAST(COUNT(*) AS BIGINT) AS n_grams,
             CAST(COUNT(b.shash) AS BIGINT) AS n_hits
      FROM dc_occ o LEFT JOIN dc_bench b USING (shash)
      GROUP BY o.doc_id
    ), dc_verdicts AS (
      SELECT c.doc_id,
             CAST(COALESCE(a.n_grams, 0) AS BIGINT) AS n_grams,
             CAST(COALESCE(a.n_hits, 0) AS BIGINT) AS n_hits,
             CAST(COALESCE(a.n_hits, 0) * {PPM}
                  // GREATEST(COALESCE(a.n_grams, 0), 1) AS BIGINT)
               AS hit_ppm,
             COALESCE(a.n_hits, 0) >= {min_hits} AS contaminated
      FROM (SELECT DISTINCT doc_id FROM {corpus_table}) c
      LEFT JOIN dc_agg a USING (doc_id)
    )
"""
