"""Plan-shape pins for the optimization round (r13-opt).

Each pin guards a measured regression class: a duplicated-subtree
explosion that a missing checkpoint would silently reintroduce, or a
kernel/expression dispatch that a refactor could flip.
"""

from __future__ import annotations

SF = "/root/testdata/sf0.001"


def _plan(df):
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_minmax_rescan_final_plan_stays_deduped(spark):
    """The maintain->rescan->maintain chain references each stage 3x
    (flagged/slice/healthy legs); without a checkpoint on the LAST
    maintain the final plan tripled every upstream subtree — measured
    194 SortMergeJoins / 196 Exchanges before the r13-opt fix, 2/6
    after. Pin a loose ceiling so the explosion cannot sneak back."""
    from go_nonrat_annotation_pipeline_spark.plans.queries_minmax_rescan import (
        q_incremental_minmax_rescan_e2e,
    )

    plan = _plan(q_incremental_minmax_rescan_e2e(spark, SF))
    # formatted explain prints each node twice (tree + details)
    assert plan.count(") SortMergeJoin") <= 12
    assert plan.count(") Exchange") <= 24


def test_drain_assignment_dispatch_by_cell_count(spark):
    """assign_with_residual: expression form at or below KERNEL_CELLS
    (bit-parity with the attested path), ONE Arrow kernel beyond (a
    fired drain leaves hundreds of cells, where the folded-literal
    expressions cost seconds per action)."""
    from pyspark.sql import functions as F

    from go_nonrat_annotation_pipeline_spark.operators.decontam_drain import (
        KERNEL_CELLS,
        assign_with_residual,
    )
    from go_nonrat_annotation_pipeline_spark.sources.testdata import load_table

    emb = load_table(spark, SF, "embeddings").limit(50)
    vecs = emb.select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    )
    few = [(i + 1, [1.0 if j == i % 4 else 0.0 for j in range(64)]) for i in range(4)]
    many = [
        (i + 1, [1.0 if j == i % 64 else 0.0 for j in range(64)])
        for i in range(KERNEL_CELLS + 1)
    ]
    p_few = _plan(assign_with_residual(vecs, "vec_id", "v", few))
    p_many = _plan(assign_with_residual(vecs, "vec_id", "v", many))
    assert "ArrowEvalPython" not in p_few
    assert p_many.count("ArrowEvalPython") == 2  # printed twice
