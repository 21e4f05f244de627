"""Survivorship rules (operators/survivorship.py): deterministic
tiebreaks, null handling, and rule semantics on a hand-built cluster."""

from __future__ import annotations

from go_nonrat_annotation_pipeline_spark.operators import survivorship as SV

SCHEMA = "cl long, name string, seg string, ts long"

ROWS = [
    (1, "Ann", "A", 10),
    (1, "Annabelle", "B", 20),
    (1, "Ann", "B", 30),
    (1, None, "B", 40),
    (2, "Bo", None, 1),
    (2, "Cy", None, 2),
]


def _df(spark):
    return spark.createDataFrame(ROWS, SCHEMA)


def test_pick_mode_with_tiebreak(spark):
    got = {r.cl: r.seg for r in SV.pick_mode(_df(spark), "cl", "seg").collect()}
    assert got[1] == "B"        # 3x B beats 1x A
    assert 2 not in got         # all-null column: no winner row


def test_pick_mode_tie_takes_smallest(spark):
    df = _df(spark).where("ts <= 20")  # A x1, B x1 -> tie -> 'A'
    got = {r.cl: r.seg for r in SV.pick_mode(df, "cl", "seg").collect()}
    assert got[1] == "A"


def test_pick_longest_skips_nulls(spark):
    got = {r.cl: r.name for r in SV.pick_longest(_df(spark), "cl", "name").collect()}
    assert got[1] == "Annabelle"
    assert got[2] == "Bo"  # equal length: smallest value


def test_pick_latest_by_order_col(spark):
    got = {r.cl: r.name for r in SV.pick_latest(_df(spark), "cl", "name", "ts").collect()}
    assert got[1] == "Ann"  # ts=40 row is null-name, skipped; ts=30 wins
    assert got[2] == "Cy"
