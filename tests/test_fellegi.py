"""Fellegi–Sunter scoring (operators/fellegi.py): the data-driven u
matches the hand-computed random-pair agreement probability, the
fixed-point fold is left-to-right exact, verdicts are monotone in the
number of agreeing fields, and the weight table is broadcast (no
shuffle added to the pair map)."""

from __future__ import annotations

from pyspark.sql import functions as F

from go_nonrat_annotation_pipeline_spark.operators import fellegi as FS


def test_u_ppm_matches_hand_count(spark):
    # values: a×3, b×2, c×1 over N=6 records
    rec = spark.createDataFrame(
        [("a",), ("a",), ("a",), ("b",), ("b",), ("c",)], "v string"
    )
    u = FS.u_ppm_equality(rec, "v").collect()[0].u_ppm
    # agree pairs = 3·2 + 2·1 = 8 ordered; total ordered = 6·5 = 30
    assert u == 8 * FS.PPM // 30


def test_score_fold_and_verdicts(spark):
    pairs = spark.createDataFrame(
        [(1, True, True), (2, True, False), (3, False, False)],
        "pid long, g1 boolean, g2 boolean",
    ).withColumns(
        {
            "alr_1": F.lit(50 * FS.PPM).cast("long"),  # ratio 50
            "dlr_1": F.lit(FS.PPM // 10).cast("long"),  # ratio 0.1
            "alr_2": F.lit(8 * FS.PPM).cast("long"),
            "dlr_2": F.lit(FS.PPM // 4).cast("long"),
        }
    )
    out = {
        r.pid: r
        for r in FS.fs_score(
            pairs,
            [("g1", "alr_1", "dlr_1"), ("g2", "alr_2", "dlr_2")],
            upper_ppm=100 * FS.PPM,
            lower_ppm=2 * FS.PPM,
        ).collect()
    }
    # left-to-right integer fold: ((1e6·50e6)/1e6 ·8e6)/1e6 = 400e6
    assert out[1].score_ppm == 400 * FS.PPM and out[1].verdict == "match"
    # 50e6 then ×0.25 → 12.5e6: possible
    assert out[2].score_ppm == 12_500_000 and out[2].verdict == "possible"
    # 0.1 then ×0.25 → 25_000: non-match
    assert out[3].score_ppm == 25_000 and out[3].verdict == "non_match"


def test_more_agreement_never_scores_lower(spark):
    """With every agree-LR > PPM > disagree-LR (the FS regularity
    condition m > u), flipping any gamma to True must not lower the
    score."""
    import itertools

    rows = [
        (i, *bits)
        for i, bits in enumerate(itertools.product([False, True], repeat=3))
    ]
    pairs = spark.createDataFrame(
        rows, "pid long, g1 boolean, g2 boolean, g3 boolean"
    ).withColumns(
        {
            "alr": F.lit(12 * FS.PPM).cast("long"),
            "dlr": F.lit(FS.PPM // 8).cast("long"),
        }
    )
    got = {
        tuple(
            (r.g1, r.g2, r.g3)
        ): r.score_ppm
        for r in FS.fs_score(
            pairs,
            [("g1", "alr", "dlr"), ("g2", "alr", "dlr"), ("g3", "alr", "dlr")],
        ).collect()
    }
    for bits, s in got.items():
        for j in range(3):
            if not bits[j]:
                up = tuple(True if k == j else b for k, b in enumerate(bits))
                assert got[up] >= s


def test_registered_pairs_plan_broadcasts_weights(spark):
    from go_nonrat_annotation_pipeline_spark.plans.queries_fellegi import (
        q_fs_match_scores,
    )

    df = q_fs_match_scores(spark, "/root/testdata/sf0.001")
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    # the one-row weight table joins in as a broadcast nested loop (a
    # cross join), never a shuffle
    assert "BroadcastNestedLoopJoin" in plan
    assert plan.count("EvalPython") == 0
