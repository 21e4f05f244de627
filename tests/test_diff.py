"""Snapshot diff (operators/diff): null-safe classification semantics
and join-shape audit."""

from __future__ import annotations

from go_nonrat_annotation_pipeline_spark.operators.diff import (
    diff_counts,
    snapshot_diff,
)

from test_plans import plan


def test_all_change_classes_and_null_safety(spark):
    old = spark.createDataFrame(
        [
            (1, "a", 10),      # unchanged
            (2, "b", 20),      # changed (value)
            (3, None, 30),     # NULL -> NULL field = unchanged
            (4, None, 40),     # NULL -> value = changed
            (5, "e", None),    # value -> NULL = changed
            (6, "f", 60),      # deleted
        ],
        "k int, s string, v int",
    )
    new = spark.createDataFrame(
        [
            (1, "a", 10),
            (2, "B", 20),
            (3, None, 30),
            (4, "d", 40),
            (5, "e", None),
            (7, "g", 70),      # added
        ],
        "k int, s string, v int",
    )
    d = snapshot_diff(old, new, keys=["k"])
    got = {r.k: r.change_type for r in d.collect()}
    assert got == {
        1: "unchanged",
        2: "changed",
        3: "unchanged",
        4: "changed",
        5: "unchanged",   # v: NULL==NULL null-safe; s equal
        6: "deleted",
        7: "added",
    }
    counts = {r.change_type: r.n for r in diff_counts(d).collect()}
    assert counts == {"unchanged": 3, "changed": 2, "deleted": 1, "added": 1}
    # old/new values are carried for audit
    row4 = {r.k: r for r in d.collect()}[4]
    assert row4.s_old is None and row4.s_new == "d"


def test_compare_cols_subset_ignores_other_columns(spark):
    old = spark.createDataFrame([(1, "a", 1)], "k int, s string, noise int")
    new = spark.createDataFrame([(1, "a", 999)], "k int, s string, noise int")
    d = snapshot_diff(old, new, keys=["k"], compare_cols=["s"])
    assert d.first().change_type == "unchanged"


def test_single_join_shape(spark, tmp_path):
    # one SortMergeJoin/ShuffledHashJoin over the two snapshot scans —
    # no extra exchanges beyond the two join-side shuffles
    old = spark.range(1000).selectExpr("id as k", "id % 7 as v")
    new = spark.range(500, 1500).selectExpr("id as k", "id % 5 as v")
    d = snapshot_diff(old, new, keys=["k"])
    p = plan(d)
    assert p.count(") Exchange") <= 2, p
