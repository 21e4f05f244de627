"""Graph operators on hand-built graphs with known answers, plus the
bounding behaviors that keep them scale-safe."""

from __future__ import annotations

from pyspark.sql import functions as F

from go_nonrat_annotation_pipeline_spark.operators import graph as G


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "a long, b long")


def test_triangle_count_known_graph(spark):
    # K4 has 4 triangles, 6 edges; plus a pendant edge (4-5): no new triangle
    k4 = [(a, b) for a in range(4) for b in range(4) if a < b]
    [row] = G.triangle_count(_edges(spark, k4 + [(4, 5)])).collect()
    assert row["n_edges"] == 7
    assert row["n_triangles"] == 4
    # wedges in K4: C(3,2) per vertex as low point... oriented wedges = C(out_deg,2) summed
    # orientation low->high: out_degs are 3,2,1,0 (+1 for node 4) -> 3+1+0+0+0 = 4 wedges... recompute:
    # node0 out={1,2,3}: C(3,2)=3; node1 out={2,3}: 1; node2 out={3}: 0; node4 out={5}: 0
    assert row["n_wedges"] == 4


def test_triangle_count_duplicate_and_reversed_edges(spark):
    # canonicalization must collapse (a,b)/(b,a)/self-loops
    tri = [(0, 1), (1, 0), (1, 2), (0, 2), (2, 2)]
    [row] = G.triangle_count(_edges(spark, tri)).collect()
    assert row["n_edges"] == 3 and row["n_triangles"] == 1


def test_k_hop_reach_path_graph(spark):
    # path 0-1-2-3-4: from node 2, 2 hops reach {0,1,3,4}; from 0: {1,2}
    path = [(i, i + 1) for i in range(4)]
    seeds = spark.createDataFrame([(0,), (2,)], "node long")
    got = {r["node"]: r["reach"] for r in G.k_hop_reach(_edges(spark, path), seeds, 2).collect()}
    assert got == {0: 2, 2: 4}


def test_co_occurrence_bounds_groups(spark):
    # one group of 3 (3 pairs), one group of 60 exceeding max_group=50 (dropped)
    rows = [(1, i) for i in range(3)] + [(2, i) for i in range(60)]
    df = spark.createDataFrame(rows, "g long, item long")
    edges = G.co_occurrence_edges(df, "g", "item", max_group=50)
    assert edges.count() == 3
    assert edges.where("a >= b").count() == 0


def test_co_occurrence_dedups_multigroup_pairs(spark):
    # same pair in two groups -> one edge
    rows = [(1, 10), (1, 20), (2, 10), (2, 20)]
    df = spark.createDataFrame(rows, "g long, item long")
    assert G.co_occurrence_edges(df, "g", "item").count() == 1
