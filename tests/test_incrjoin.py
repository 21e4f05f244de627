from __future__ import annotations

from go_nonrat_annotation_pipeline_spark.operators.incrjoin import (
    delta_join,
    join_view_maintain,
)


def _canon(df):
    return sorted(tuple(r) for r in df.collect())


def test_maintained_equals_full_rejoin(spark):
    # bases and insert-only deltas; keys hit every delta-term shape:
    # k=1 base-only, k=2 delta-L only, k=3 delta-R only, k=4 both
    # deltas, k=5 delta-only key (no base rows on either side)
    lo = spark.createDataFrame(
        [(1, "l1"), (3, "l3"), (4, "l4")], "k long, lv string"
    )
    dl = spark.createDataFrame(
        [(2, "l2d"), (4, "l4d"), (5, "l5d")], "k long, lv string"
    )
    ro = spark.createDataFrame(
        [(1, "r1"), (2, "r2"), (4, "r4")], "k long, rv string"
    )
    dr = spark.createDataFrame(
        [(3, "r3d"), (4, "r4d"), (5, "r5d")], "k long, rv string"
    )
    view0 = lo.join(ro, "k")
    maintained = join_view_maintain(view0, lo, dl, ro, dr, "k")
    full = lo.unionByName(dl).join(ro.unionByName(dr), "k")
    assert _canon(maintained) == _canon(full)


def test_delta_terms_partition_the_delta(spark):
    lo = spark.createDataFrame([(1, 10)], "k long, lv long")
    dl = spark.createDataFrame([(1, 11)], "k long, lv long")
    ro = spark.createDataFrame([(1, 20)], "k long, rv long")
    dr = spark.createDataFrame([(1, 21)], "k long, rv long")
    d = delta_join(lo, dl, ro, dr, "k")
    # ΔL⋈R0=(11,20), L0⋈ΔR=(10,21), ΔL⋈ΔR=(11,21): disjoint, no (10,20)
    assert _canon(d) == [(1, 10, 21), (1, 11, 20), (1, 11, 21)]


def test_empty_deltas_are_noop(spark):
    lo = spark.createDataFrame([(1, "a")], "k long, lv string")
    ro = spark.createDataFrame([(1, "b")], "k long, rv string")
    empty_l = spark.createDataFrame([], "k long, lv string")
    empty_r = spark.createDataFrame([], "k long, rv string")
    view0 = lo.join(ro, "k")
    maintained = join_view_maintain(view0, lo, empty_l, ro, empty_r, "k")
    assert _canon(maintained) == _canon(view0)
