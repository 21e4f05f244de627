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


def test_star_components_match_label_propagation(spark):
    """Alternating large-star/small-star equals min-label propagation on
    a random pair graph, and converges on a 300-node path graph whose
    diameter would exceed the propagation iteration cap."""
    import random

    from go_nonrat_annotation_pipeline_spark.operators.dedup import (
        connected_components,
        connected_components_star,
    )

    rnd = random.Random(11)
    pairs = list({(min(a, b), max(a, b))
                  for a, b in ((rnd.randint(0, 400), rnd.randint(0, 400))
                               for _ in range(300)) if a != b})
    df = spark.createDataFrame(pairs, "id_a long, id_b long")
    got = {
        (r.doc_id, r.cluster_id)
        for r in connected_components_star(df).collect()
    }
    want = {
        (r.doc_id, r.cluster_id) for r in connected_components(df).collect()
    }
    assert got == want

    # path graph 0-1-2-...-300: diameter 300 ≫ star's O(log n) rounds
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(300)], "id_a long, id_b long"
    )
    labels = connected_components_star(chain, max_iterations=30).collect()
    assert len(labels) == 301
    assert {r.cluster_id for r in labels} == {0}


def test_winnowing_guarantee(spark):
    """Winnowing's core guarantee: two docs sharing a long token run
    share at least one fingerprint; disjoint docs share none."""
    from go_nonrat_annotation_pipeline_spark.operators.dedup import (
        winnow_fingerprints,
    )

    shared_run = "alpha beta gamma delta epsilon zeta eta theta"
    rows = [
        (1, f"one two {shared_run} three"),
        (2, f"{shared_run} nine ten eleven"),
        (3, "completely different words here entirely unrelated tokens"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    fps = winnow_fingerprints(df, "doc_id", "text", k=3, w=4)
    sets: dict[int, set] = {}
    for r in fps.collect():
        sets.setdefault(r.doc_id, set()).add(r.fp)
    assert sets[1] & sets[2]      # shared 8-token run ⇒ shared fingerprint
    assert not (sets[1] & sets[3])
    assert not (sets[2] & sets[3])


# ---------------------------------------------------------------------------
# incremental (continuous-ingestion) near-dup
# ---------------------------------------------------------------------------
def test_incremental_equals_cross_side_subset_of_selfjoin(spark):
    """The incremental operator over a store/incoming split must find
    exactly the CROSS-SIDE pairs the full self-join finds (same bands,
    same verify threshold) — no pair invented, none lost."""
    from pyspark.sql import functions as F

    from go_nonrat_annotation_pipeline_spark.operators.dedup import (
        incremental_minhash_dups,
        minhash_lsh_pairs,
    )

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    store = docs.where(F.col("doc_id") % 5 != 0)
    incoming = docs.where(F.col("doc_id") % 5 == 0)

    inc = {
        (r.incoming_id, r.store_id, r.jaccard)
        for r in incremental_minhash_dups(store, incoming).collect()
    }
    full = minhash_lsh_pairs(docs).collect()
    cross = set()
    for r in full:
        a_in, b_in = r.id_a % 5 == 0, r.id_b % 5 == 0
        if a_in != b_in:  # one side incoming, one side store
            iid, sid = (r.id_a, r.id_b) if a_in else (r.id_b, r.id_a)
            cross.add((iid, sid, r.jaccard))
    assert inc == cross
    assert inc, "split produced no cross-side near-dups; pick another split"


def test_incremental_store_side_never_pairs_with_itself(spark):
    from pyspark.sql import functions as F

    from go_nonrat_annotation_pipeline_spark.operators.dedup import (
        incremental_minhash_dups,
    )

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    store = docs.where(F.col("doc_id") % 5 != 0)
    incoming = docs.where(F.col("doc_id") % 5 == 0)
    out = incremental_minhash_dups(store, incoming)
    bad = out.where(
        (F.col("incoming_id") % 5 != 0) | (F.col("store_id") % 5 == 0)
    )
    assert bad.isEmpty()
