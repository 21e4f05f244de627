"""Plan-shape pins for the round-12 exact family: the lossless
accelerators must stay expression-side (no Python in the hot path),
join their dictionary-sized tables by BROADCAST hash join (never
sort-merge), and keep the aggregate-not-window discipline where the
plan claims it."""

from __future__ import annotations

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _plan(df):
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_exact_pairs_drained_broadcasts_compat(spark):
    from go_nonrat_annotation_pipeline_spark.plans.queries_dedup_exact_cells2 import (
        dedup_embedding_exact_pairs_drained,
    )

    plan = _plan(dedup_embedding_exact_pairs_drained(spark, SF))
    # compat table broadcast; bench side equi-joined — never sort-merge
    assert plan.count("BroadcastHashJoin") >= 1
    assert "SortMergeJoin" not in plan
    assert "EvalPython" not in plan and "MapInPandas" not in plan


def test_ann_gate_sampled_shape(spark):
    """The rewritten gate: broadcast bench-cells join + ONE hash
    aggregate for the verdicts; no window, no Python, no
    nested-loop join (the probe replaced the crossJoin)."""
    from go_nonrat_annotation_pipeline_spark.plans.queries_semantic_decontam_ann import (
        q_semantic_decontam_ann,
    )

    plan = _plan(q_semantic_decontam_ann(spark, SF))
    assert "BroadcastHashJoin" in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "SortMergeJoin" not in plan
    assert "Window" not in plan
    assert "EvalPython" not in plan


def test_ann_gate_kernel_twin_uses_arrow_once(spark):
    """Kernel twin: exactly the probe runs in Python (one Arrow eval);
    everything downstream stays JVM-side."""
    from go_nonrat_annotation_pipeline_spark.plans.queries_semantic_decontam_ann2 import (
        q_semantic_decontam_ann_kernel,
    )

    plan = _plan(q_semantic_decontam_ann_kernel(spark, SF))
    # presence of the Arrow kernel + absence of row-at-a-time Python:
    # an exact print count is brittle across Spark plan-format versions
    # (ADVICE r13)
    assert plan.count("ArrowEvalPython") >= 1
    assert "BatchEvalPython" not in plan
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_knn_exact_kernel_candidates_one_broadcast_join(spark):
    # r13 optimization reshaped this plan: both exact passes run inside
    # ONE Arrow kernel (operators/knn_kernel.topk_candidate_ids) that
    # emits a provable superset of the top-k; the exact re-rank joins
    # the (broadcast) bench once and ranks in a single vec_id window.
    from go_nonrat_annotation_pipeline_spark.plans.queries_knn_exact import (
        sim_knn_exact_cells,
    )

    plan = _plan(sim_knn_exact_cells(spark, SF))
    assert plan.count("ArrowEvalPython") >= 1  # exact count is format-brittle
    assert plan.count(") BroadcastHashJoin") >= 1
    assert "SortMergeJoin" not in plan
    assert "BatchEvalPython" not in plan  # vectorized only, never row-at-a-time
    # the top-k rank window is the ONLY window; ") Window\n" avoids
    # matching the WindowGroupLimit pushdown node
    assert plan.count(") Window\n") == 1


def test_kmv_jaccard_single_row_no_full_sort(spark):
    """The sketch path: TakeOrderedAndProject heaps (no global Sort->
    Limit) feed k-row tables; the only exchanges are the two distinct()
    shuffles plus k-row plumbing."""
    from go_nonrat_annotation_pipeline_spark.plans.queries_kmv_jaccard import (
        q_kmv_jaccard,
    )

    df = q_kmv_jaccard(spark, SF)
    plan = _plan(df)
    assert "TakeOrderedAndProject" in plan
    rows = df.collect()
    assert len(rows) == 1
    r = rows[0]
    # estimator sanity on real data: est within the sketch's coarse
    # band of truth (k=64 -> SE ~ 1/8), and internally consistent
    assert 0 <= r.n_both <= r.k_used
    assert r.jaccard_est_ppm == r.n_both * 1_000_000 // r.k_used
    assert abs(r.jaccard_est_ppm - r.jaccard_true_ppm) < 300_000
