"""Incremental MIN maintenance under deletes — the non-self-
maintainable aggregate, with bounded auxiliary state.

COUNT/SUM follow a CDC batch with signed deltas (operators/incragg.py);
MIN cannot: deleting the current minimum forces a base rescan unless
auxiliary state remembers runners-up (Gupta & Mumick 1995 §4: MIN/MAX
are not self-maintainable w.r.t. deletions). The standard bounded
answer is a per-group k-buffer of the smallest values:

STATE  (group, n, buf, complete): ``buf`` = sorted multiset of the k
smallest values; ``complete`` ⟺ buf holds the WHOLE group.

INVARIANT (what makes maintenance exact): buf ⊆ base values, and buf
⊇ every base value < max(buf) ("sticky boundary"). Then
min(buf) = true MIN whenever buf is non-empty; a group needs a RESCAN
only when deletes exhaust the entire buffer while rows remain — at
most one rescan per k deletes per group, the knob k buys.

MAINTENANCE (one batch, pure relational — no base rescan):
- deletes at or below the boundary remove one buffered occurrence
  (multiset subtract); deletes above it touch only unbuffered rows
  (decrement n alone);
- inserts at or below the boundary (or into complete/new groups)
  merge into the buffer; inserts above it are unbuffered;
- the merged buffer re-trims to its k smallest (the boundary only
  tightens, so the invariant is preserved); a trim clears
  ``complete``;
- n follows signed counts; groups reaching n = 0 drop;
- an EXHAUSTED group (buf = [], n > 0) stays exhausted — inserts bump
  n but are NOT buffered (the empty buffer has no boundary, so a
  re-seeded buffer could not prove it holds the minimum) — until the
  caller rescans it with :func:`minbuf_state`.

Scale shape: the state is k values per group (dictionary-sized);
maintenance explodes ONLY the state + batch (never the base), one
keyed window for the re-trim, hash joins throughout.

The registry oracle recomputes MIN from the post-CDC snapshot —
maintained ≡ recompute, the same algebraic contract the other IVM
families attest.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window


def minbuf_state(
    df: DataFrame, group_col: str, value_col: str, k: int
) -> DataFrame:
    """Build the state from a snapshot: ``group_col, n, buf, complete``."""
    rn = F.row_number().over(Window.partitionBy(group_col).orderBy("_v"))
    buf = (
        df.select(group_col, F.col(value_col).cast("long").alias("_v"))
        .withColumn("_rn", rn)
        .where(F.col("_rn") <= k)
        .groupBy(group_col)
        .agg(F.sort_array(F.collect_list("_v")).alias("buf"))
    )
    n = df.groupBy(group_col).agg(F.count(F.lit(1)).cast("long").alias("n"))
    return n.join(buf, group_col).withColumn(
        "complete", F.col("n") <= F.lit(k)
    )


def minbuf_maintain(
    state: DataFrame,
    inserts: DataFrame,
    deletes: DataFrame,
    group_col: str,
    value_col: str,
    k: int,
) -> DataFrame:
    """Apply a CDC batch (``inserts`` / ``deletes``: rows of
    (group_col, value_col); deletes MUST exist in the base — the CDC
    contract). Returns the new state; a group with ``buf = []`` and
    ``n > 0`` needs a rescan (see :func:`min_view`). Exhaustion is
    STICKY: further batches leave such a group's buffer empty (inserts
    only bump ``n``) until the caller rescans it via
    :func:`minbuf_state` — re-seeding from an insert alone would lose
    smaller unbuffered base values."""
    g, v = group_col, value_col
    bounds = state.select(
        g,
        # try_: an exhausted group's buf is empty and plain element_at
        # throws under ANSI; _exh below is what the logic branches on
        F.try_element_at("buf", F.lit(-1)).alias("_bmax"),
        F.col("complete").alias("_comp"),
        # ADVICE r9: an EXHAUSTED group (buf drained, rows remain) must
        # stay flagged — its _bmax is NULL exactly like a brand-new
        # group's, so an explicit flag is what tells them apart. An
        # insert into an exhausted group must NOT re-seed the buffer
        # (smaller unbuffered base values may remain; min_view would
        # report the insert as the min and clear needs_rescan).
        (F.size("buf") == 0).alias("_exh"),
    )
    ins = inserts.select(g, F.col(v).cast("long").alias("_v"))
    dels = deletes.select(g, F.col(v).cast("long").alias("_v"))

    # buffer-relevant slices of the batch (outside rows only touch n;
    # exhausted groups buffer NOTHING until the caller rescans them)
    d_buf = (
        dels.join(bounds, g)
        .where(
            (~F.col("_exh"))
            & (F.col("_comp") | (F.col("_v") <= F.col("_bmax")))
        )
        .select(g, "_v")
    )
    i_buf = (
        ins.join(bounds, g, "left")
        .where(
            F.col("_exh").isNull()  # no state row: brand-new group
            | (
                (~F.col("_exh"))
                & (F.col("_comp") | (F.col("_v") <= F.col("_bmax")))
            )
        )
        .select(g, "_v")
    )

    # multiset fold: buf occurrences − buffered deletes + buffered inserts
    cb = (
        state.select(g, F.explode("buf").alias("_v"))
        .groupBy(g, "_v")
        .agg(F.count(F.lit(1)).alias("_cb"))
    )
    cd = d_buf.groupBy(g, "_v").agg(F.count(F.lit(1)).alias("_cd"))
    ci = i_buf.groupBy(g, "_v").agg(F.count(F.lit(1)).alias("_ci"))
    merged = (
        cb.join(cd, [g, "_v"], "full_outer")
        .join(ci, [g, "_v"], "full_outer")
        .select(
            g,
            "_v",
            (
                F.greatest(
                    F.coalesce("_cb", F.lit(0)) - F.coalesce("_cd", F.lit(0)),
                    F.lit(0),
                )
                + F.coalesce("_ci", F.lit(0))
            ).alias("_cnt"),
        )
        .where(F.col("_cnt") > 0)
    )
    rows = merged.withColumn(
        "_i", F.explode(F.expr("sequence(1, _cnt)"))
    ).select(g, "_v")
    rn = F.row_number().over(Window.partitionBy(g).orderBy("_v"))
    kept = rows.withColumn("_rn", rn).where(F.col("_rn") <= k)
    new_buf = kept.groupBy(g).agg(
        F.sort_array(F.collect_list("_v")).alias("buf")
    )
    sizes = rows.groupBy(g).agg(F.count(F.lit(1)).alias("_m"))

    # n follows signed counts; completeness survives only untrimmed
    dn = dels.groupBy(g).agg(F.count(F.lit(1)).alias("_dn"))
    dins = ins.groupBy(g).agg(F.count(F.lit(1)).alias("_in"))
    nn = (
        state.select(g, "n", F.col("complete").alias("_comp0"))
        .join(dn, g, "full_outer")
        .join(dins, g, "full_outer")
        .select(
            g,
            (
                F.coalesce("n", F.lit(0))
                + F.coalesce("_in", F.lit(0))
                - F.coalesce("_dn", F.lit(0))
            ).cast("long").alias("n"),
            F.coalesce("_comp0", F.lit(True)).alias("_comp0"),
        )
        .where(F.col("n") > 0)
    )
    return (
        nn.join(new_buf, g, "left")
        .join(sizes, g, "left")
        .select(
            g,
            "n",
            F.coalesce("buf", F.expr("CAST(array() AS array<bigint>)"))
            .alias("buf"),
            (
                F.col("_comp0")
                & (F.coalesce("_m", F.lit(0)) <= F.lit(k))
            ).alias("complete"),
        )
    )


def maxbuf_state(
    df: DataFrame, group_col: str, value_col: str, k: int
) -> DataFrame:
    """MAX twin by negation: a k-buffer of the LARGEST values is the
    MIN machinery over -value (Gupta-Mumick §4 treats MIN/MAX
    symmetrically). State stores negated values; use :func:`max_view`."""
    neg = df.select(
        group_col, (-F.col(value_col).cast("long")).alias("_negv")
    )
    return minbuf_state(neg, group_col, "_negv", k)


def maxbuf_maintain(
    state: DataFrame,
    inserts: DataFrame,
    deletes: DataFrame,
    group_col: str,
    value_col: str,
    k: int,
) -> DataFrame:
    """Maintain the negated state (see :func:`maxbuf_state`); sticky
    exhaustion and the CDC contract carry over unchanged."""

    def neg(df):
        return df.select(
            group_col, (-F.col(value_col).cast("long")).alias("_negv")
        )

    return minbuf_maintain(
        state, neg(inserts), neg(deletes), group_col, "_negv", k
    )


def max_view(state: DataFrame, group_col: str) -> DataFrame:
    """``group_col, n, max_val, needs_rescan`` over a negated state."""
    v = min_view(state, group_col)
    return v.select(
        group_col,
        "n",
        (-F.col("min_val")).cast("long").alias("max_val"),
        "needs_rescan",
    )


def min_view(state: DataFrame, group_col: str) -> DataFrame:
    """``group_col, n, min_val, needs_rescan`` — min_val is NULL
    exactly when the buffer is exhausted (rescan that group against
    the base; at most one per k deletes per group)."""
    return state.select(
        group_col,
        "n",
        F.when(F.size("buf") > 0, F.element_at("buf", 1))
        .cast("long")
        .alias("min_val"),
        (F.size("buf") == 0).alias("needs_rescan"),
    )
