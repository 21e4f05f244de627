"""Unit tests for the dedup clustering operator (chains force multiple
label-propagation iterations; disjoint cliques must not merge)."""

from __future__ import annotations

from go_nonrat_annotation_pipeline_spark.operators.dedup import connected_components


def test_connected_components_chain_and_clique(spark):
    pairs = spark.createDataFrame(
        [
            # a 5-chain: 10-11-12-13-14 (label must propagate 4 hops)
            (11, 10), (11, 12), (12, 13), (14, 13),
            # a separate triangle
            (20, 21), (21, 22), (20, 22),
            # an isolated pair
            (30, 31),
        ],
        ["id_a", "id_b"],
    )
    out = {
        r.doc_id: r.cluster_id for r in connected_components(pairs).collect()
    }
    assert out == {
        10: 10, 11: 10, 12: 10, 13: 10, 14: 10,
        20: 20, 21: 20, 22: 20,
        30: 30, 31: 30,
    }
