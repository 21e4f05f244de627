"""Fixed-point PageRank (operators/graphrank): mass conservation,
symmetry on regular graphs, hub dominance, determinism."""

from __future__ import annotations

from go_nonrat_annotation_pipeline_spark.operators import graphrank as GR


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "a long, b long")


def test_ring_graph_is_uniform(spark):
    # 4-cycle: every node degree 2 → ranks identical at every iteration
    edges = _edges(spark, [(1, 2), (2, 3), (3, 4), (1, 4)])
    rows = GR.pagerank_fixed_point(edges, iters=3, top_k=10).collect()
    assert len(rows) == 4
    assert len({r.r_fp for r in rows}) == 1
    # uniform rank stays at ~scale/N up to truncation
    assert abs(rows[0].r_fp - GR.SCALE // 4) <= 3


def test_star_center_dominates(spark):
    # star: center 1 linked to 5 leaves
    edges = _edges(spark, [(1, k) for k in range(2, 7)])
    rows = GR.pagerank_fixed_point(edges, iters=3, top_k=10).collect()
    assert rows[0].node == 1 and rows[0].rank == 1
    leaf_ranks = {r.r_fp for r in rows if r.node != 1}
    assert len(leaf_ranks) == 1  # leaves are symmetric
    assert rows[0].r_fp > 3 * max(leaf_ranks)


def test_mass_approximately_conserved(spark):
    edges = _edges(spark, [(1, 2), (2, 3), (3, 4), (1, 4), (1, 3)])
    rows = GR.pagerank_fixed_point(edges, iters=4, top_k=10).collect()
    total = sum(r.r_fp for r in rows)
    # integer truncation only ever loses mass, a few units per op
    assert GR.SCALE * 0.999 <= total <= GR.SCALE


def test_deterministic_and_top_k_bounded(spark):
    edges = _edges(spark, [(i, j) for i in range(1, 8) for j in range(i + 1, 8)])
    a = [tuple(r) for r in GR.pagerank_fixed_point(edges, 3, top_k=3).collect()]
    b = [tuple(r) for r in GR.pagerank_fixed_point(edges, 3, top_k=3).collect()]
    assert a == b and len(a) == 3
    assert [r[0] for r in a] == [1, 2, 3]  # rank column is 1..k
