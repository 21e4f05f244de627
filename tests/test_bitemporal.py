"""Bitemporal reconstruction (operators/bitemporal.py): corrections
supersede latest-recording-wins, the as-of view is blind to later
recordings (a past belief stays reconstructible), run-collapse merges
adjacent equal values, and the plan stays window-only (no joins on the
assertion log)."""

from __future__ import annotations

from go_nonrat_annotation_pipeline_spark.operators.bitemporal import (
    bitemporal_history,
)

SCHEMA = "user_id long, val string, valid_us long, recorded_us long, _tie long"

# one entity; valid days 10/20/30; a correction at rec=300 rewrites
# valid day 10 from 'a' to 'c' (and a lower-tie duplicate is ignored)
ROWS = [
    (1, "a", 10, 100, 1),
    (1, "b", 20, 110, 2),
    (1, "b", 30, 120, 3),
    (1, "c", 10, 300, 4),   # late correction, rewrites day 10
    (1, "x", 10, 300, 0),   # same recording instant, lower tie loses
]


def _hist(spark, as_of=None):
    df = spark.createDataFrame(ROWS, SCHEMA)
    return {
        (r.valid_from_us): r
        for r in bitemporal_history(df, as_of_us=as_of).collect()
    }


def test_correction_supersedes_and_asof_is_blind(spark):
    now = _hist(spark)
    # current knowledge: day 10 says 'c' (the rec=300 correction wins,
    # tie 4 > 0), and it absorbed 2 superseded assertions
    assert now[10].val == "c" and now[10].n_superseded == 2
    # day 20 starts the 'b' run; day 30's equal value collapses into it
    assert now[20].val == "b"
    assert 30 not in now and now[20].valid_to_us is None

    asof = _hist(spark, as_of=200)
    # before the correction was recorded: day 10 still believes 'a'
    assert asof[10].val == "a" and asof[10].n_superseded == 0
    assert asof[20].val == "b" and asof[20].valid_to_us is None


def test_versions_and_bounds(spark):
    now = _hist(spark)
    assert now[10].version == 1 and now[10].valid_to_us == 20
    assert now[20].version == 2


def test_registered_history_plan_is_window_only(spark):
    from go_nonrat_annotation_pipeline_spark.plans.queries_bitemporal import (
        q_bitemporal_history,
    )

    df = q_bitemporal_history(spark, "/root/testdata/sf0.001")
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "Join" not in plan and "EvalPython" not in plan
    assert "hashpartitioning(user_id" in plan
