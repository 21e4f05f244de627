"""Plan-shape pins for the late-round-13 additions (TPC-H suite
widening): the EXISTS shape compiles to a LeftSemi hash join with the
correlated date residual (never join+distinct), top-k compiles to
TakeOrderedAndProject, dimension sides broadcast, and nothing drops
into row-at-a-time Python."""

from __future__ import annotations

SF = "/root/testdata/sf0.001"


def _plan(df):
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_q4_exists_is_left_semi_with_date_residual(spark):
    from go_nonrat_annotation_pipeline_spark.plans.queries_tpch_suite import (
        q4_order_priority,
    )

    plan = _plan(q4_order_priority(spark, SF))
    assert "LeftSemi" in plan
    # the 30-day grace comparison rides the semi join as a residual
    # condition, not a post-join filter over a materialized join
    assert "INTERVAL '30' DAY" in plan
    assert "HashAggregate" in plan
    assert "EvalPython" not in plan


def test_q10_topk_take_ordered_dims_broadcast(spark):
    from go_nonrat_annotation_pipeline_spark.plans.queries_tpch_suite import (
        q10_returned_items,
    )

    plan = _plan(q10_returned_items(spark, SF))
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastHashJoin" in plan
    assert "EvalPython" not in plan


def test_q12_case_counts_single_aggregate(spark):
    from go_nonrat_annotation_pipeline_spark.plans.queries_tpch_suite import (
        q12_priority_shipping,
    )

    plan = _plan(q12_priority_shipping(spark, SF))
    # exactly one logical aggregate (partial+final pair): the CASE pair
    # folds into it — no pivot/expand stage
    assert plan.count("Expand") == 0
    assert "EvalPython" not in plan


def test_q14_part_dim_broadcast_no_python(spark):
    from go_nonrat_annotation_pipeline_spark.plans.queries_tpch_suite import (
        q14_promo_effect,
    )

    plan = _plan(q14_promo_effect(spark, SF))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "EvalPython" not in plan


def test_q7_nation_filter_pushed_to_both_dim_scans(spark):
    from go_nonrat_annotation_pipeline_spark.plans.queries_tpch_suite2 import (
        q7_volume_shipping,
    )

    plan = _plan(q7_volume_shipping(spark, SF))
    # the two-nation IN filter reaches BOTH nation scans (supplier
    # chain and customer chain), and the ship-date range reaches the
    # lineitem scan
    assert plan.count("In(n_name, [NATION_3,NATION_4])") == 2
    assert "GreaterThanOrEqual(l_shipdate" in plan
    assert "EvalPython" not in plan


def test_q18_having_prunes_before_join_topk_take_ordered(spark):
    from go_nonrat_annotation_pipeline_spark.plans.queries_tpch_suite2 import (
        q18_large_volume_customer,
    )

    plan = _plan(q18_large_volume_customer(spark, SF))
    # the qty-sum aggregate sits BELOW the orders join (filter on the
    # aggregated frame, then join) and top-k is a heap
    assert "TakeOrderedAndProject" in plan
    assert "sum_qty" in plan
    assert "EvalPython" not in plan


def test_q19_disjunction_prunes_part_build_side(spark):
    from go_nonrat_annotation_pipeline_spark.plans.queries_tpch_suite2 import (
        q19_disjunctive_revenue,
    )

    plan = _plan(q19_disjunctive_revenue(spark, SF))
    # part-only legs of the OR (brand/size) are extracted and pushed
    # to the part scan; the join side stays broadcast
    assert "Brand#12" in plan and "p_size" in plan
    assert "BroadcastHashJoin" in plan
    assert "EvalPython" not in plan


def test_q22_anti_join_and_single_row_scalar_broadcast(spark):
    from go_nonrat_annotation_pipeline_spark.plans.queries_tpch_suite2 import (
        q22_sales_opportunity,
    )

    plan = _plan(q22_sales_opportunity(spark, SF))
    # NOT EXISTS compiles to a hash anti join; the scalar (n, total)
    # row rides a single-row broadcast nested loop (the
    # q_scalar_subquery pattern), never a shuffled cross product
    assert "LeftAnti" in plan
    assert "BroadcastNestedLoopJoin" in plan
    assert "EvalPython" not in plan


def test_mannwhitney_ranks_via_range_exchange(spark):
    from go_nonrat_annotation_pipeline_spark.plans.queries_privacy2 import (
        q_mannwhitney_u,
    )

    plan = _plan(q_mannwhitney_u(spark, SF))
    # ranks come from value_rank2's range exchange — never a global
    # single-task RANK() window over the combined sample
    assert "rangepartitioning" in plan
    assert "EvalPython" not in plan


def test_t_closeness_windows_partitioned_by_group(spark):
    import re

    from go_nonrat_annotation_pipeline_spark.plans.queries_privacy2 import (
        q_t_closeness,
    )

    plan = _plan(q_t_closeness(spark, SF))
    specs = re.findall(r"windowspecdefinition\(([^)]*)\)", plan)
    assert specs, "expected cumulative-sum window specs"
    for s in specs:
        # group-partitioned cumsum, or the 10-row constant-partition
        # global cumsum (col-derived `lvl % 1`, projected as a _w
        # partition column)
        assert "seg" in s or "_w" in s
    assert "EvalPython" not in plan


def test_ewma_lag_window_partitioned_by_type(spark):
    import re

    from go_nonrat_annotation_pipeline_spark.plans.queries_timeseries2 import (
        q_ewma_daily,
    )

    plan = _plan(q_ewma_daily(spark, SF))
    specs = re.findall(r"windowspecdefinition\(([^)]*)\)", plan)
    assert specs and all("event_type" in s for s in specs)
    assert "EvalPython" not in plan


def test_burstiness_lag_window_partitioned_by_user(spark):
    import re

    from go_nonrat_annotation_pipeline_spark.plans.queries_timeseries2 import (
        q_burstiness_fano,
    )

    plan = _plan(q_burstiness_fano(spark, SF))
    specs = re.findall(r"windowspecdefinition\(([^)]*)\)", plan)
    assert specs and all("user_id" in s for s in specs)
    assert "TakeOrderedAndProject" in plan
    assert "EvalPython" not in plan


def test_trigram_lead_windows_partitioned_by_user(spark):
    import re

    from go_nonrat_annotation_pipeline_spark.plans.queries_sequences2 import (
        q_event_trigrams,
    )

    plan = _plan(q_event_trigrams(spark, SF))
    specs = re.findall(r"windowspecdefinition\(([^)]*)\)", plan)
    assert specs and all("user_id" in s for s in specs)
    assert "TakeOrderedAndProject" in plan
    assert "EvalPython" not in plan


def test_funnel_within_window_partitioned_no_self_join(spark):
    import re

    from go_nonrat_annotation_pipeline_spark.plans.queries_analytics2 import (
        q_funnel_within,
    )

    plan = _plan(q_funnel_within(spark, SF))
    specs = re.findall(r"windowspecdefinition\(([^)]*)\)", plan)
    assert specs and all("user_id" in s for s in specs)
    # the timed funnel must NOT be a view x purchase self-join
    assert "SortMergeJoin" not in plan
    assert "EvalPython" not in plan


def test_equidepth_bins_via_range_exchange(spark):
    from go_nonrat_annotation_pipeline_spark.plans.queries_analytics2 import (
        q_equidepth_bins,
    )

    plan = _plan(q_equidepth_bins(spark, SF))
    # boundaries read off the value_rank2 rank table — range exchange
    # present, no corpus-sized global sort
    assert "rangepartitioning" in plan
    assert "EvalPython" not in plan


def test_mode_no_window_broadcast_argmax(spark):
    from go_nonrat_annotation_pipeline_spark.plans.queries_analytics2 import (
        q_mode_per_group,
    )

    plan = _plan(q_mode_per_group(spark, SF))
    assert ") Window\n" not in plan
    assert "BroadcastHashJoin" in plan
    assert "EvalPython" not in plan


def test_hard_negatives_bucket_join_partitioned_window(spark):
    import re

    from go_nonrat_annotation_pipeline_spark.plans.queries_hardneg import (
        q_hard_negatives,
    )

    plan = _plan(q_hard_negatives(spark, SF))
    # candidates come from the bucket equi-join (hash join on bucket/d),
    # the top-k window partitions by the anchor id, no Python nodes
    specs = re.findall(r"windowspecdefinition\(([^)]*)\)", plan)
    assert specs and all("_a" in s for s in specs)
    assert "CartesianProduct" not in plan
    assert "EvalPython" not in plan


def test_bounce_rate_windows_partitioned_by_user(spark):
    import re

    from go_nonrat_annotation_pipeline_spark.plans.queries_sessions2 import (
        q_bounce_rate,
    )

    plan = _plan(q_bounce_rate(spark, SF))
    specs = re.findall(r"windowspecdefinition\(([^)]*)\)", plan)
    assert specs and all("user_id" in s for s in specs)
    assert "EvalPython" not in plan


def test_source_jaccard_postings_join_sizes_broadcast(spark):
    from go_nonrat_annotation_pipeline_spark.plans.queries_srcsim import (
        q_source_jaccard,
    )

    plan = _plan(q_source_jaccard(spark, SF))
    # intersections come from the bigram-key equi-join; the per-source
    # size table broadcasts; top-20 is a heap
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "EvalPython" not in plan


def test_haar_single_aggregate_no_window(spark):
    from go_nonrat_annotation_pipeline_spark.plans.queries_sequences2 import (
        q_haar_coeffs,
    )

    plan = _plan(q_haar_coeffs(spark, SF))
    # signed sums need no window at all — daily counts cross the
    # 4-row broadcast level table into one hash aggregate
    assert ") Window\n" not in plan
    assert "BroadcastNestedLoopJoin" in plan  # 4-row level broadcast
    assert "EvalPython" not in plan
