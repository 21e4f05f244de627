"""Mathematical invariants of the late-round-13 operators — the
properties the oracle hash cannot see failing by coincidence."""

from __future__ import annotations

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def test_mannwhitney_u_identity(spark):
    """u_a_x2 + u_b_x2 == 2 * n_a * n_b (the rank-sum partition
    identity — holds for ANY data iff the tie-averaged ranks are
    computed correctly)."""
    from go_nonrat_annotation_pipeline_spark.plans.queries_privacy2 import (
        q_mannwhitney_u,
    )

    r = q_mannwhitney_u(spark, SF).collect()[0]
    assert r.u_a_x2 + r.u_b_x2 == 2 * r.n_a * r.n_b
    assert 0 <= r.u_a_x2 <= 2 * r.n_a * r.n_b


def test_t_closeness_bounded_and_complete(spark):
    """EMD over probability distributions is in [0, 1] → t_ppm in
    [0, 1e6]; every reported group is at least 1 member."""
    from go_nonrat_annotation_pipeline_spark.plans.queries_privacy2 import (
        q_t_closeness,
    )

    rows = q_t_closeness(spark, SF).collect()
    assert rows
    for r in rows:
        assert 0 <= r.t_ppm <= 1_000_000
        assert r.n_g >= 1


def test_ewma_conserves_mass_on_constant_series(spark):
    """On any day with >= K fully-populated predecessors, the dyadic
    weights sum to 1023/1024 — so for a CONSTANT series c, ewma_x1024
    must be exactly 1023 * c. Checked on a synthetic constant frame
    with the module's own lag terms (the registered query's output
    month doesn't cover synthetic dates, so the filtered read-time
    tail can't be used directly)."""
    cnt = (
        spark.range(40)
        .select(
            F.lit("t").alias("event_type"),
            F.date_add(F.lit("2023-12-01").cast("date"), F.col("id").cast("int")).alias("d"),
            F.lit(7).cast("long").alias("c"),
        )
    )
    from go_nonrat_annotation_pipeline_spark.plans.queries_timeseries2 import (
        _K,
    )
    from pyspark.sql import Window

    w = Window.partitionBy("event_type").orderBy("d")
    ewma = F.lit(0).cast("long")
    for j in range(_K):
        term = F.col("c") if j == 0 else F.coalesce(
            F.lag("c", j).over(w), F.lit(0)
        )
        ewma = ewma + term * F.lit(1 << (_K - 1 - j))
    sm = cnt.withColumn("e", ewma).where(
        F.col("d") >= F.lit("2023-12-11").cast("date")
    )
    vals = {r.e for r in sm.collect()}
    assert vals == {7 * 1023}


def test_haar_level_sums_telescoped(spark):
    """Σ_k |coeff(1,k)| is bounded by total event mass in the window,
    and every level is present for every type (grid completeness)."""
    from go_nonrat_annotation_pipeline_spark.plans.queries_sequences2 import (
        q_haar_coeffs,
    )

    rows = q_haar_coeffs(spark, SF).collect()
    lvls = {(r.event_type, r.lvl) for r in rows}
    types = {t for t, _ in lvls}
    for t in types:
        assert {lv for tt, lv in lvls if tt == t} == {1, 2, 3, 4}
    # level-l coefficient count halves per level: 8, 4, 2, 1 per type
    from collections import Counter

    c = Counter((r.event_type, r.lvl) for r in rows)
    for t in types:
        assert [c[(t, lv)] for lv in (1, 2, 3, 4)] == [8, 4, 2, 1]


def test_equidepth_bins_are_monotone_and_within_range(spark):
    from go_nonrat_annotation_pipeline_spark.plans.queries_analytics2 import (
        q_equidepth_bins,
    )
    from go_nonrat_annotation_pipeline_spark.sources.testdata import (
        load_table,
    )

    rows = q_equidepth_bins(spark, SF).collect()
    assert [r.bin for r in rows] == list(range(1, 10))
    bs = [r.boundary_e2 for r in rows]
    assert bs == sorted(bs)
    li = load_table(spark, SF, "lineitem").agg(
        F.min("l_extendedprice").alias("lo"),
        F.max("l_extendedprice").alias("hi"),
    ).collect()[0]
    assert bs[0] >= int(li.lo * 100) - 1
    assert bs[-1] <= int(li.hi * 100) + 1


def test_bounce_sessions_partition_events(spark):
    """Σ session sizes == total events (sessions partition the
    stream); bounce_ppm consistent with its own numerator."""
    from go_nonrat_annotation_pipeline_spark.plans.queries_sessions2 import (
        q_bounce_rate,
    )
    from go_nonrat_annotation_pipeline_spark.sources.testdata import (
        load_table,
    )

    r = q_bounce_rate(spark, SF).collect()[0]
    n_events = load_table(spark, SF, "events").count()
    assert r.n_sessions <= n_events
    assert r.n_bounces <= r.n_sessions
    assert r.bounce_ppm == r.n_bounces * 1_000_000 // r.n_sessions


def test_hard_negatives_never_same_label(spark):
    from go_nonrat_annotation_pipeline_spark.plans.queries_hardneg import (
        q_hard_negatives,
    )

    rows = q_hard_negatives(spark, SF).collect()
    assert rows
    for r in rows:
        assert r.anchor_label != r.neg_label
        assert 1 <= r.rank <= 3


def test_source_jaccard_bounds(spark):
    from go_nonrat_annotation_pipeline_spark.plans.queries_srcsim import (
        q_source_jaccard,
    )

    for r in q_source_jaccard(spark, SF).collect():
        assert 0 <= r.jaccard_ppm <= 1_000_000
        assert r.n_inter <= min(r.n_a, r.n_b)
