from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from go_nonrat_annotation_pipeline_spark.operators import scd as SCD


def _log(spark):
    # one user flip-flopping, one constant, with a same-ts tiebreak pair
    rows = [
        (1, 1, datetime(2024, 1, 1, 0, 0, 0), "a"),
        (2, 1, datetime(2024, 1, 1, 0, 1, 0), "a"),   # same run
        (3, 1, datetime(2024, 1, 1, 0, 2, 0), "b"),   # change
        (4, 1, datetime(2024, 1, 1, 0, 3, 0), "a"),   # change back
        (5, 2, datetime(2024, 1, 1, 0, 0, 0), "x"),
        (6, 2, datetime(2024, 1, 1, 0, 5, 0), "x"),
        # user 3: two events at the SAME ts — event_id must tiebreak
        (7, 3, datetime(2024, 1, 1, 0, 0, 0), "p"),
        (8, 3, datetime(2024, 1, 1, 0, 0, 0), "q"),
    ]
    return spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string"
    )


def test_history_run_collapse_and_versions(spark):
    h = SCD.scd2_history(_log(spark)).orderBy("user_id", "version")
    rows = h.collect()
    u1 = [r for r in rows if r.user_id == 1]
    assert [r.attr for r in u1] == ["a", "b", "a"]
    assert [r.version for r in u1] == [1, 2, 3]
    # intervals chain: each valid_to equals the next valid_from
    for prev, nxt in zip(u1, u1[1:]):
        assert prev.valid_to_us == nxt.valid_from_us
    assert u1[-1].valid_to_us is None and u1[-1].is_current == 1
    assert sum(r.is_current for r in u1) == 1
    # constant user collapses to one open version
    u2 = [r for r in rows if r.user_id == 2]
    assert len(u2) == 1 and u2[0].is_current == 1
    # same-ts pair: event_id order -> p then q, zero-length first interval
    u3 = [r for r in rows if r.user_id == 3]
    assert [r.attr for r in u3] == ["p", "q"]
    assert u3[0].valid_to_us == u3[0].valid_from_us


def test_current_is_one_row_per_key(spark):
    cur = SCD.scd2_current(_log(spark))
    rows = {r.user_id: r for r in cur.collect()}
    assert set(rows) == {1, 2, 3}
    assert rows[1].attr == "a" and rows[1].n_versions == 3
    assert rows[2].attr == "x" and rows[2].n_versions == 1
    assert rows[3].attr == "q" and rows[3].n_versions == 2


def test_single_window_exec(spark):
    # lag-filter, lead and row_number share one window spec; the plan
    # must sort/exchange once per window stage, not once per function
    h = SCD.scd2_history(_log(spark))
    plan = h._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") <= 2  # one keyed shuffle (+AQE read)
