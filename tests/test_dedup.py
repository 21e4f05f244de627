"""Unit tests for the dedup operators: clustering (chains force multiple
label-propagation iterations; disjoint cliques must not merge) and the
LSH-bucketed embedding near-dup scale path (soundness + recall vs the
brute-force exact baseline)."""

from __future__ import annotations

from go_nonrat_annotation_pipeline_spark.operators.dedup import (
    connected_components,
    embedding_near_dup_pairs,
    embedding_near_dup_pairs_lsh,
)
from go_nonrat_annotation_pipeline_spark.sources.testdata import load_table


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


def test_embedding_lsh_sound_and_recalls(spark):
    """The bucketed variant must return a subset of the exact pairs
    (same threshold — no false positives survive the verify stage) and
    recall a decent fraction of them despite pruning. Deterministic
    buckets ⇒ a fixed measured recall (0.57 at sf0.01), asserted with
    margin."""
    emb = load_table(spark, "/root/testdata/sf0.01", "embeddings")
    exact = {
        (r.id_a, r.id_b)
        for r in embedding_near_dup_pairs(emb, "vec_id", "embedding", 0.45, None).collect()
    }
    approx = {
        (r.id_a, r.id_b)
        for r in embedding_near_dup_pairs_lsh(emb, "vec_id", "embedding", 0.45).collect()
    }
    assert approx <= exact
    assert exact, "baseline found no pairs — threshold drifted?"
    assert len(approx) / len(exact) >= 0.5


def test_cosine_kernel_agrees_with_expression(spark):
    """The Arrow verify kernel (scale setting) must reproduce the JVM
    expression cosine to the rounded 6dp on every surviving pair."""
    emb = load_table(spark, "/root/testdata/sf0.01", "embeddings")
    expr = {
        (r.id_a, r.id_b): r.cosine
        for r in embedding_near_dup_pairs_lsh(emb, "vec_id", "embedding", 0.45).collect()
    }
    kern = {
        (r.id_a, r.id_b): r.cosine
        for r in embedding_near_dup_pairs_lsh(
            emb, "vec_id", "embedding", 0.45, verify_kernel=True
        ).collect()
    }
    assert expr == kern
