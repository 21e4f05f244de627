"""Fellegi–Sunter probabilistic record-linkage scoring, integer-exact.

The classic decision model (Fellegi & Sunter, JASA 1969): for a
candidate record pair, each comparison field j contributes a likelihood
ratio — m_j/u_j when the fields agree, (1−m_j)/(1−u_j) when they
disagree — where m_j = P(agree | match) and u_j = P(agree | non-match);
the pair's match weight is the product (classically the sum of logs),
thresholded into match / possible / non-match.

Engine-exact discipline (the PMI lesson, operators/collocations.py):
logs and double products drift across engines, so everything here is
ppm FIXED-POINT with a DECLARED field order —

- u_j for an equality field is data-driven: the probability two
  distinct random records agree equals sum_v c_v(c_v−1) / N(N−1)
  over the field's value counts — an integer ratio, materialized as
  ``SUM(c*(c-1)) * 1_000_000 DIV (N*(N-1))``;
- m_j is a declared clerical prior in ppm (FS practice: m is set or
  EM-estimated; the deterministic prior keeps the oracle exact);
- the pair score folds LEFT-TO-RIGHT over the declared field order:
  ``score = least(CAP, score * least(LR_CAP, ratio_j) DIV 1e6)`` — the
  same integer expression text in Spark and DuckDB, so scores (and
  therefore verdicts) hash-match exactly. Rank-equivalent to the
  log-weight sum with clipped weights; the saturation constants make
  the fold overflow-free by construction (see SCORE_CAP below).

Scale shape: u-weights are one aggregate per field over the RECORD
table (dictionary-sized when records are deduplicated keys, as in the
registered queries); scoring is a map over candidate pairs with the
one-row weight table cross-joined (broadcast). No UDFs, no floats.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

PPM = 1_000_000
DEFAULT_M_PPM = 900_000
# FS comparator fields whose u cannot come from the equality formula
# (similarity gates) use a declared prior:
DEFAULT_SIM_U_PPM = 10_000

# verdict thresholds on the fixed-point product (score starts at PPM;
# >PPM means evidence for match, <PPM against)
DEFAULT_UPPER_PPM = 20 * PPM
DEFAULT_LOWER_PPM = PPM // 2

# SATURATION (round-10 property-test finding): an unclamped fold
# overflows BIGINT — four fields agreeing at lr 200 already exceed
# 2^63 mid-multiply. The fold therefore saturates: the running score
# clamps at SCORE_CAP and each field's ratio at LR_CAP, chosen so the
# per-step multiply provably fits (SCORE_CAP · LR_CAP = 9·10^18 <
# 2^63−1). Semantics are unchanged where it matters: SCORE_CAP is
# 5000× the default match threshold and LR_CAP is ratio-90 evidence
# per field — saturation only compresses scores already far beyond
# any decision boundary (the log-space analogue: clipping the summed
# weight). Thresholds must sit below SCORE_CAP.
SCORE_CAP = 10**11
LR_CAP = 9 * 10**7


def u_ppm_equality(records: DataFrame, col: str) -> DataFrame:
    """One-row DataFrame (u_ppm BIGINT): probability two distinct
    random records agree exactly on ``col``, in ppm."""
    counts = records.groupBy(col).agg(F.count(F.lit(1)).alias("_c"))
    return counts.agg(
        F.expr(
            f"CAST((SUM(_c * (_c - 1)) * {PPM}L) DIV "
            f"GREATEST(SUM(_c) * (SUM(_c) - 1), 1L) AS BIGINT)"
        ).alias("u_ppm")
    )


def sql_u_ppm(source: str, col: str) -> str:
    """DuckDB scalar-subquery mirror of :func:`u_ppm_equality`."""
    return (
        f"(SELECT CAST((SUM(c * (c - 1)) * CAST({PPM} AS BIGINT)) // "
        f"GREATEST(SUM(c) * (SUM(c) - 1), 1) AS BIGINT) FROM "
        f"(SELECT COUNT(*) AS c FROM {source} GROUP BY {col}))"
    )


def lr_ppm_exprs(
    u_ppm_col: str, m_ppm: int = DEFAULT_M_PPM
) -> tuple[str, str]:
    """Expression text (shared across engines modulo DIV/'//') for the
    agree / disagree likelihood ratios in ppm, clamped so a
    never-agreeing field (u = 0) cannot divide by zero."""
    # L suffixes: Spark parses bare integer literals as INT and the
    # ppm product overflows 32 bits under ANSI (DuckDB mirrors build
    # their own text — its integer literals are already 64-bit)
    agree = (
        f"CAST(({m_ppm}L * {PPM}L) DIV GREATEST({u_ppm_col}, 1L) "
        f"AS BIGINT)"
    )
    disagree = (
        f"CAST((({PPM}L - {m_ppm}L) * {PPM}L) DIV "
        f"GREATEST({PPM}L - {u_ppm_col}, 1L) AS BIGINT)"
    )
    return agree, disagree


def fs_weight_table(
    records: DataFrame,
    fields: list[str],
    m_ppm: int = DEFAULT_M_PPM,
) -> DataFrame:
    """(field, u_ppm, m_ppm, agree_lr_ppm, disagree_lr_ppm) — one row
    per equality field, u data-driven from the record table."""
    parts = []
    for f in fields:
        agree, disagree = lr_ppm_exprs("u_ppm", m_ppm)
        parts.append(
            u_ppm_equality(records, f).select(
                F.lit(f).alias("field"),
                "u_ppm",
                F.lit(m_ppm).cast("long").alias("m_ppm"),
                F.expr(agree).alias("agree_lr_ppm"),
                F.expr(disagree).alias("disagree_lr_ppm"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def fs_score(
    pairs: DataFrame,
    gamma_lr_pairs: list[tuple[str, str, str]],
    upper_ppm: int = DEFAULT_UPPER_PPM,
    lower_ppm: int = DEFAULT_LOWER_PPM,
    score_col: str = "score_ppm",
    verdict_col: str = "verdict",
) -> DataFrame:
    """Fold the fixed-point likelihood product over ``gamma_lr_pairs``
    = [(gamma_bool_col, agree_lr_col, disagree_lr_col), ...] IN ORDER
    (order is part of the contract — integer DIV is not associative),
    then classify. ``pairs`` must already carry the gamma columns and
    the per-field LR columns (cross-join the one-row pivoted weight
    table in). The fold SATURATES at SCORE_CAP / LR_CAP (module doc) —
    overflow-free by construction."""
    assert upper_ppm < SCORE_CAP and lower_ppm < SCORE_CAP
    expr = f"CAST({PPM} AS BIGINT)"
    for g, alr, dlr in gamma_lr_pairs:
        lr = (
            f"LEAST(CAST({LR_CAP} AS BIGINT), "
            f"CASE WHEN {g} THEN {alr} ELSE {dlr} END)"
        )
        expr = (
            f"LEAST(CAST({SCORE_CAP} AS BIGINT), "
            f"(({expr}) * ({lr}) DIV {PPM}L))"
        )
    scored = pairs.withColumn(score_col, F.expr(expr).cast("long"))
    return scored.withColumn(
        verdict_col,
        F.when(F.col(score_col) >= upper_ppm, F.lit("match"))
        .when(F.col(score_col) >= lower_ppm, F.lit("possible"))
        .otherwise(F.lit("non_match")),
    )


def sql_fs_score(
    gamma_lr_pairs: list[tuple[str, str, str]],
    upper_ppm: int = DEFAULT_UPPER_PPM,
    lower_ppm: int = DEFAULT_LOWER_PPM,
) -> tuple[str, str]:
    """DuckDB mirror of :func:`fs_score`'s two expressions
    (score, verdict) — `//` for DIV, same left-to-right saturating
    fold."""
    assert upper_ppm < SCORE_CAP and lower_ppm < SCORE_CAP
    expr = f"CAST({PPM} AS BIGINT)"
    for g, alr, dlr in gamma_lr_pairs:
        lr = (
            f"LEAST(CAST({LR_CAP} AS BIGINT), "
            f"CASE WHEN {g} THEN {alr} ELSE {dlr} END)"
        )
        expr = (
            f"LEAST(CAST({SCORE_CAP} AS BIGINT), "
            f"(({expr}) * ({lr}) // {PPM}))"
        )
    score = f"CAST({expr} AS BIGINT)"
    verdict = (
        f"CASE WHEN {score} >= {upper_ppm} THEN 'match' "
        f"WHEN {score} >= {lower_ppm} THEN 'possible' "
        f"ELSE 'non_match' END"
    )
    return score, verdict
