"""SemDeDup invariants: cell-bounded pairs, id-ordered drop rule,
report consistency, brute-force agreement on a small corpus."""

from __future__ import annotations

import math

from go_nonrat_annotation_pipeline_spark.operators import semdedup as SD
from go_nonrat_annotation_pipeline_spark.operators.kmeans import kmeans_fit
from go_nonrat_annotation_pipeline_spark.sources.testdata import load_table

SF = "/root/testdata/sf0.001"
TAU = 0.45
K, ITERS = 4, 2


def _fitted(spark):
    emb = load_table(spark, SF, "embeddings")
    cents = kmeans_fit(emb, k=K, max_iter=ITERS, early_stop=False)
    return emb, SD.semdedup_assign(emb, cents).localCheckpoint()


def test_drops_match_bruteforce_within_cells(spark):
    emb, assigned = _fitted(spark)
    rows = assigned.collect()
    by_cell: dict[int, list] = {}
    for r in rows:
        by_cell.setdefault(r.cell, []).append((r._id, r.v))

    def cos(a, b):
        dot = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        return dot / (na * nb)

    expected = {}
    for cell, vecs in by_cell.items():
        vecs.sort()
        for j, (vid, v) in enumerate(vecs):
            # Same unadjusted threshold as semdedup_drops — an epsilon
            # here would admit pairs in [TAU-eps, TAU) that the operator
            # (correctly) excludes and fail the equality spuriously.
            keepers = [
                (uid, cos(u, v)) for uid, u in vecs[:j] if cos(u, v) >= TAU
            ]
            if keepers:
                expected[vid] = (cell, min(k for k, _ in keepers))

    got = {
        r.drop_id: (r.cell, r.keep_id)
        for r in SD.semdedup_drops(assigned, TAU).collect()
    }
    assert got == expected
    assert len(got) > 0  # the sf0.001 corpus does contain near-dups


def test_drops_never_cross_cells(spark):
    _, assigned = _fitted(spark)
    cell_of = {r._id: r.cell for r in assigned.collect()}
    for r in SD.semdedup_drops(assigned, TAU).collect():
        assert cell_of[r.drop_id] == cell_of[r.keep_id] == r.cell
        assert r.keep_id < r.drop_id


def test_report_totals(spark):
    emb, assigned = _fitted(spark)
    drops = SD.semdedup_drops(assigned, TAU)
    rep = SD.semdedup_report(assigned, drops).collect()
    assert sum(r.n_vecs for r in rep) == emb.count()
    assert sum(r.n_dropped for r in rep) == drops.count()
    assert all(0 <= r.n_dropped < r.n_vecs for r in rep)


def _skewed(spark, n_hot=60, n_cold=12, dim=4, seed=7):
    """One tight blob (n_hot spread-out members near [1,0,..]) plus a
    few scattered cold vectors — k-means puts the blob in one hot cell."""
    import random

    rng = random.Random(seed)
    rows = []
    for i in range(n_hot):
        v = [1.0 + rng.uniform(-0.05, 0.05)] + [
            rng.uniform(-0.05, 0.05) for _ in range(dim - 1)
        ]
        rows.append((i, v))
    for i in range(n_cold):
        v = [rng.uniform(-1, 1) for _ in range(dim)]
        v[1 + i % (dim - 1)] += 3.0  # push away from the blob
        rows.append((1000 + i, v))
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_resplit_recursion_labels(spark):
    """semdedup_resplit composes with itself: second-level labels gain
    one '.<sub>' suffix (never a double 'c' prefix), hottest_cell's raw
    label round-trips, and membership is conserved at every level."""
    emb = _skewed(spark)
    cents = kmeans_fit(emb, k=3, max_iter=3, early_stop=False)
    assigned = SD.semdedup_assign(emb, cents).localCheckpoint()
    n_total = assigned.count()

    lab1, n1 = SD.hottest_cell(assigned)
    assert isinstance(lab1, int) and n1 >= 30
    once = SD.semdedup_resplit(assigned, lab1, sub_k=2, iters=3)
    once.localCheckpoint()
    labels1 = {r.cell for r in once.select("cell").distinct().collect()}
    assert all(isinstance(c, str) for c in labels1)
    assert not any(c.startswith("cc") for c in labels1)
    assert {c for c in labels1 if c.startswith(f"c{lab1}.")}
    assert once.count() == n_total

    # second level: the raw string label from hottest_cell feeds back in
    lab2, n2 = SD.hottest_cell(once)
    assert isinstance(lab2, str)
    twice = SD.semdedup_resplit(once, lab2, sub_k=2, iters=3)
    labels2 = {r.cell for r in twice.select("cell").distinct().collect()}
    assert not any(c.startswith("cc") for c in labels2)
    if lab2.startswith(f"c{lab1}."):  # split a child → 3-part labels
        assert any(c.count(".") == 2 for c in labels2)
    assert twice.count() == n_total
    # untouched cells pass through verbatim
    assert labels1 - {lab2} <= labels2


def test_drain_caps_cell_sizes(spark):
    """One call drains every hot cell below the threshold; membership
    conserved; the quadratic within-cell pair bound collapses."""
    emb = _skewed(spark)
    cents = kmeans_fit(emb, k=3, max_iter=3, early_stop=False)
    assigned = SD.semdedup_assign(emb, cents).localCheckpoint()
    n_total = assigned.count()
    _, n_hot_before = SD.hottest_cell(assigned)

    cap = 25
    drained, hist = SD.semdedup_drain(assigned, cap, sub_k=2, iters=3)
    assert drained.count() == n_total
    sizes = [
        r.n
        for r in drained.groupBy("cell").count().withColumnRenamed(
            "count", "n"
        ).collect()
    ]
    assert max(sizes) <= cap
    assert hist and hist[0][1] == n_hot_before
    # quadratic pair bound shrinks: sum n_i^2 after < before
    before = [
        r["count"] for r in assigned.groupBy("cell").count().collect()
    ]
    assert sum(n * n for n in sizes) < sum(n * n for n in before)
    # drops/report still compose downstream on string labels
    drops = SD.semdedup_drops(drained, TAU)
    rep = SD.semdedup_report(drained, drops)
    assert rep.count() == len(sizes)


def test_drain_terminates_on_duplicate_clique(spark):
    """A cell of identical vectors cannot be split — drain must detect
    the no-progress round and stop instead of looping."""
    rows = [(i, [1.0, 0.0, 0.0]) for i in range(30)] + [
        (100 + i, [-3.0 + i, 2.0, 1.0]) for i in range(3)
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = kmeans_fit(emb, k=2, max_iter=2, early_stop=False)
    assigned = SD.semdedup_assign(emb, cents).localCheckpoint()
    drained, hist = SD.semdedup_drain(
        assigned, max_cell_size=10, sub_k=2, iters=2, max_rounds=8
    )
    assert drained.count() == emb.count()
    # it stopped well before max_rounds: the clique is marked stuck
    # after the round whose largest child equals the parent
    assert len(hist) < 8
    assert any(child == before for _, before, child in hist)
