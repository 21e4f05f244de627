"""Interval-overlap join via time-bin bucketing.

Complements operators/joins.range_interval_join (POINT-in-interval):
this is the interval × interval OVERLAP join — `a.start < b.end AND
b.start < a.end` (half-open) — which Spark would otherwise execute as
a BroadcastNestedLoopJoin, a quadratic disaster on two fact-sized
inputs.

Strategy (the bin-join of DBMS temporal literature, same family as
joins.range_interval_join): explode every interval to the fixed-width
time bins it touches, equi-join on the bin, dedup pairs, verify the
exact overlap predicate. Two overlapping intervals share at least one
bin (their intersection lies in some bin), so recall is exact; a pair
spanning several common bins is deduped by the DISTINCT on the output
tuple.

Scale posture: ONE shuffle, the bin equi-join. The explode factor is
len/bin_width + 1 per interval — pick ``bin_width`` at the p99
interval length so the factor stays ~2; per-bin join density is
bounded by how many intervals genuinely touch a window of that width
(data density, not corpus size). Intervals longer than the assumed cap
still join correctly (they just explode to more bins). All arithmetic
is integer microseconds — float-free at the driver hash boundary.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_overlap_join(
    a: DataFrame,
    b: DataFrame,
    bin_width_us: int,
    a_cols: tuple[str, str, str] = ("a_id", "a_start", "a_end"),
    b_cols: tuple[str, str, str] = ("b_id", "b_start", "b_end"),
) -> DataFrame:
    """All (a, b) pairs whose [start, end) intervals overlap, with the
    exact overlap length: (a_id, b_id, overlap_us).

    Inputs carry (id, start, end) in integer microseconds with
    start < end; column names per ``a_cols`` / ``b_cols``.
    """

    def binned(df: DataFrame, id_c: str, s_c: str, e_c: str) -> DataFrame:
        # end is exclusive: an interval ending exactly on a bin edge
        # does not touch the next bin. Integer `div`, never `/`+cast:
        # double division of µs epochs (~1.7e15, ulp 0.25) can round up
        # across the bin edge and disagree with DuckDB's `//`.
        bins = F.sequence(
            F.expr(f"{s_c} div {bin_width_us}"),
            F.expr(f"({e_c} - 1) div {bin_width_us}"),
        )
        return df.select(
            id_c, s_c, e_c, F.explode(bins).alias("_bin")
        )

    a_id, a_s, a_e = a_cols
    b_id, b_s, b_e = b_cols
    ab = binned(a, a_id, a_s, a_e)
    bb = binned(b, b_id, b_s, b_e)
    overlap = F.least(F.col(a_e), F.col(b_e)) - F.greatest(
        F.col(a_s), F.col(b_s)
    )
    return (
        ab.join(bb, "_bin")
        .where((F.col(a_s) < F.col(b_e)) & (F.col(b_s) < F.col(a_e)))
        .select(a_id, b_id, overlap.alias("overlap_us"))
        .distinct()
    )


def sql_interval_overlap_join(
    a_cte: str,
    b_cte: str,
    bin_width_us: int,
    a_cols: tuple[str, str, str] = ("a_id", "a_start", "a_end"),
    b_cols: tuple[str, str, str] = ("b_id", "b_start", "b_end"),
) -> str:
    """SELECT over CTEs ``a_cte(id, start, end)`` / ``b_cte(...)``,
    bit-identical to :func:`interval_overlap_join`."""
    a_id, a_s, a_e = a_cols
    b_id, b_s, b_e = b_cols

    def binned(cte: str, s_c: str, e_c: str) -> str:
        return (
            f"SELECT *, UNNEST(GENERATE_SERIES({s_c} // {bin_width_us}, "
            f"({e_c} - 1) // {bin_width_us})) AS _bin FROM {cte}"
        )

    return f"""
    SELECT DISTINCT {a_id}, {b_id},
           LEAST({a_e}, {b_e}) - GREATEST({a_s}, {b_s}) AS overlap_us
    FROM ({binned(a_cte, a_s, a_e)}) ia
    JOIN ({binned(b_cte, b_s, b_e)}) ib USING (_bin)
    WHERE {a_s} < {b_e} AND {b_s} < {a_e}
    """
