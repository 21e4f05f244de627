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
