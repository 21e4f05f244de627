"""Interval-overlap join (operators/intervals.py): bin-join results
must equal the brute-force overlap set exactly, including the
half-open edge cases the bin trick could get wrong."""

from __future__ import annotations

from go_nonrat_annotation_pipeline_spark.operators import intervals as IV

W = 100  # bin width for the crafted cases


def _run(spark, a_rows, b_rows, bin_width=W):
    a = spark.createDataFrame(a_rows, "a_id long, a_start long, a_end long")
    b = spark.createDataFrame(b_rows, "b_id long, b_start long, b_end long")
    return {
        (r.a_id, r.b_id, r.overlap_us)
        for r in IV.interval_overlap_join(a, b, bin_width).collect()
    }


def _brute(a_rows, b_rows):
    return {
        (ai, bi, min(ae, be) - max(as_, bs))
        for (ai, as_, ae) in a_rows
        for (bi, bs, be) in b_rows
        if as_ < be and bs < ae
    }


def test_edge_cases_match_bruteforce(spark):
    a = [
        (1, 0, 100),     # exactly one bin
        (2, 50, 250),    # spans three bins
        (3, 100, 200),   # starts exactly on a bin edge
        (4, 190, 210),   # straddles an edge
        (5, 300, 301),   # 1-us interval
    ]
    b = [
        (10, 100, 150),  # touches a1 only at the edge -> NO overlap (half-open)
        (11, 0, 1000),   # covers everything
        (12, 240, 300),  # overlaps a2 by 10
        (13, 99, 101),   # crosses the same edge as a1/a3
        (14, 301, 400),  # touches a5 at the edge -> NO overlap
    ]
    got = _run(spark, a, b)
    assert got == _brute(a, b)
    assert (1, 10, 0) not in got  # half-open: edge contact is not overlap
    assert (5, 14, 0) not in got


def test_multi_bin_pair_not_duplicated(spark):
    """A pair sharing several bins must come out once (the DISTINCT)."""
    a = [(1, 0, 500)]
    b = [(2, 100, 450)]
    got = _run(spark, a, b)
    assert got == {(1, 2, 350)}


def test_intervals_longer_than_assumed_cap_still_join(spark):
    """bin_width is a performance assumption, not a correctness cap."""
    a = [(1, 0, 10_000)]  # 100 bins
    b = [(2, 9_950, 9_960), (3, 10_000, 10_100)]
    got = _run(spark, a, b)
    assert got == {(1, 2, 10)}
