"""k-core peeling: hand-checked small graphs, fixpoint behavior, and
pinned-rounds/fixpoint agreement on the testdata graph."""

from __future__ import annotations

from pyspark.sql import functions as F

from go_nonrat_annotation_pipeline_spark.operators.kcore import (
    _degrees,
    k_core_peel,
)

SF = "/root/testdata/sf0.001"


def _edges_df(spark, pairs):
    return spark.createDataFrame(pairs, "a long, b long")


def test_triangle_with_pendant_peels_to_triangle(spark):
    # triangle 1-2-3 plus pendant 3-4: 2-core is the triangle
    e = _edges_df(spark, [(1, 2), (1, 3), (2, 3), (3, 4)])
    core = k_core_peel(e, k=2, rounds=3)
    assert sorted(map(tuple, core.collect())) == [(1, 2), (1, 3), (2, 3)]


def test_chain_has_empty_2core(spark):
    # a path graph has no 2-core; peeling eats it from both ends
    e = _edges_df(spark, [(1, 2), (2, 3), (3, 4), (4, 5)])
    core = k_core_peel(e, k=2, rounds=4)
    assert core.count() == 0


def test_cascading_peel_needs_multiple_rounds(spark):
    # 4-clique with a chain hung off it: round 1 drops the tail,
    # round 2 drops the next link — a single round is NOT enough,
    # which is exactly what the unrolled oracle must mirror
    clique = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)]
    chain = [(4, 5), (5, 6)]
    e = _edges_df(spark, clique + chain)
    one = k_core_peel(e, k=2, rounds=1)
    assert (5,) in [tuple(r)[:1] for r in _degrees(one).select("n").collect()]
    full = k_core_peel(e, k=2, rounds=3)
    assert sorted(map(tuple, full.collect())) == sorted(clique)


def test_until_fixpoint_matches_pinned_when_converged(spark):
    e = _edges_df(
        spark, [(1, 2), (1, 3), (2, 3), (3, 4), (4, 5), (2, 5)]
    )
    pinned = sorted(map(tuple, k_core_peel(e, 2, rounds=5).collect()))
    fixed = sorted(
        map(tuple, k_core_peel(e, 2, rounds=50, until_fixpoint=True).collect())
    )
    assert pinned == fixed


def test_registered_query_rounds_converge_on_testdata(spark):
    """The pinned 3 rounds reach the true fixpoint on the sf0.001
    co-purchase graph — the registered histogram IS the k-core, not a
    partial peel."""
    from go_nonrat_annotation_pipeline_spark.operators import graph as G
    from go_nonrat_annotation_pipeline_spark.sources.testdata import (
        load_table,
    )

    li = load_table(spark, SF, "lineitem")
    edges = G.co_occurrence_edges(li, "l_orderkey", "l_partkey")
    core3 = k_core_peel(edges, 4, rounds=3)
    # one more round must be a no-op
    deg = _degrees(core3)
    assert deg.where(F.col("deg") < 4).count() == 0
