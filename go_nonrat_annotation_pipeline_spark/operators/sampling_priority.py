"""Priority sampling (Duffield, Lund & Thorup, JACM 2007).

Weighted sampling-without-replacement with UNBIASED subset-sum
estimates from a fixed budget of k items: each item gets priority
q_i = w_i / u_i (u_i uniform), the sample is the top-k by priority,
and with τ = the (k+1)-th priority every sampled item's estimator
ŵ_i = max(w_i, τ) satisfies E[Σ ŵ_i over sampled ∩ S] = Σ w_i over S
for ANY subset S — the one-pass answer to "keep k rows that can still
estimate any group's total". The standard tool for weighted sketching
of flows/traffic and for budgeted corpus subsampling where heavy items
must always survive (w_i ≥ τ ⇒ sampled with certainty).

Exactness discipline: u_i is the repo's deterministic md5 gate scaled
to [1, PPM]; priorities are the integer ratio w_i·PPM DIV u_i with u_i ∈ [1, PPM]
— i.e. q = w/(u/PPM) ≥ w, the DLT scaling, so τ is in WEIGHT units
and ŵ = max(w, τ) is dimensionally exact; the DIV is applied
identically in both engines, so ranks, τ, and estimators hash-match
exactly. Replayable
per salt (same property as every md5 gate in this repo).

Scale shape: priorities are a pure map; top-k is a distributed
TakeOrdered (never a global sort); τ needs only the (k+1)-th priority.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from ..functions import hashing as H

PPM = 1_000_000


def with_priority(
    df: DataFrame,
    weight: Column,
    key: Column,
    salt: str = "prio0",
) -> DataFrame:
    """Adds ``w`` (BIGINT weight) and ``priority`` = w·PPM DIV u ≥ w,
    u ∈ [1, PPM] from md5(salt|key). Weights must be ≥ 1 BIGINTs
    (scale fractional weights to integer units first)."""
    u = (
        H.char_hash(F.concat(F.lit(salt + "|"), key.cast("string"))) % PPM
    ) + 1
    return (
        df.withColumn("w", weight.cast("long"))
        .withColumn("_u", u.cast("long"))
        .withColumn("priority", F.expr(f"w * {PPM}L DIV _u").cast("long"))
        .drop("_u")
    )


def sql_priority(weight_expr: str, key_expr: str, salt: str = "prio0") -> str:
    """DuckDB mirror of the priority expression."""
    u = (
        "("
        + H.sql_char_hash(f"'{salt}|' || CAST({key_expr} AS VARCHAR)")
        + f" % {PPM}) + 1"
    )
    return f"CAST(CAST({weight_expr} AS BIGINT) * {PPM} // ({u}) AS BIGINT)"


def priority_sample(
    df: DataFrame,
    weight: Column,
    key: Column,
    k: int,
    salt: str = "prio0",
    order_cols=None,
) -> DataFrame:
    """The top-k by (priority desc, key) plus the estimator column:
    ``..., w, priority, w_est`` where w_est = max(w, τ) and τ is the
    (k+1)-th priority (0 when the population has ≤ k items — then the
    sample is exact and ŵ = w)."""
    tiebreak = order_cols if order_cols is not None else [key]
    pri = with_priority(df, weight, key, salt)
    topk1 = (
        pri.orderBy(F.desc("priority"), *tiebreak)
        .limit(k + 1)
        .localCheckpoint()
    )
    rows = topk1.select("priority").orderBy(F.desc("priority")).collect()
    tau = rows[k].priority if len(rows) > k else 0
    # the sample is the pinned top-(k+1) minus its last row — no second
    # pass over the population
    return (
        topk1.orderBy(F.desc("priority"), *tiebreak)
        .limit(min(k, len(rows)))
        .withColumn("w_est", F.greatest(F.col("w"), F.lit(tau).cast("long")))
    )
