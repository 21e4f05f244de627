"""Product quantization (operators/pq): encode determinism + map-side
plan, shortlist containment and re-rank recall against the exact
brute-force baseline."""

from __future__ import annotations

from pyspark.sql import functions as F

from go_nonrat_annotation_pipeline_spark.operators import pq as PQ
from go_nonrat_annotation_pipeline_spark.operators.similarity import (
    brute_force_topk,
)
from go_nonrat_annotation_pipeline_spark.sources.testdata import load_table

from test_plans import plan

SF = "/root/testdata/sf0.001"


def test_encode_is_map_side_and_deterministic(spark):
    emb = load_table(spark, SF, "embeddings")
    books = PQ.pq_train(emb, dim=64, m_sub=2, k_codes=8, n_iter=2)
    codes = PQ.pq_encode(emb, books)
    # pure map-side: no exchange anywhere in the encode plan
    p = plan(codes)
    assert "Exchange" not in p
    a = sorted(tuple(r) for r in codes.collect())
    b = sorted(tuple(r) for r in PQ.pq_encode(emb, books).collect())
    assert a == b
    # every code addresses a real codeword
    for s in range(2):
        mx = codes.agg(F.max(f"code_{s}"), F.min(f"code_{s}")).first()
        assert 0 <= mx[1] and mx[0] < 8


def test_rerank_recall_vs_brute_force(spark):
    """The production config (8×16 codebooks, shortlist 100, exact
    re-rank): recall@10 ≈ shortlist containment — measured 0.83 on this
    table; assert a safe floor. Pure-ADC@10 at the same config is ~0.25
    (quantization error reorders the head), which is exactly why the
    re-rank stage exists."""
    emb = load_table(spark, SF, "embeddings")
    books = PQ.pq_train(emb, dim=64, m_sub=8, k_codes=16, n_iter=3)
    codes = PQ.pq_encode(emb, books)
    qrows = sorted(
        (int(r.vec_id), [float(x) for x in r.embedding])
        for r in emb.where(F.col("vec_id") < 10).collect()
    )
    k = 10
    rr = PQ.pq_rerank_topk(codes, emb, qrows, books, shortlist=100, k=k)
    exact = brute_force_topk(emb, emb.where(F.col("vec_id") < 10), k=k)
    got = {(r.query_id, r.neighbor_id) for r in rr.collect()}
    want = {(r.query_id, r.neighbor_id) for r in exact.collect()}
    recall = len(got & want) / len(want)
    assert recall >= 0.6, recall
    # re-ranked scores are EXACT cosines: the surviving overlap must
    # carry identical scores to the brute-force baseline
    exact_scores = {
        (r.query_id, r.neighbor_id): r.cosine for r in exact.collect()
    }
    for r in rr.collect():
        key = (r.query_id, r.neighbor_id)
        if key in exact_scores:
            assert abs(r.cosine - exact_scores[key]) < 1e-9


def test_adc_scores_bounded_and_ranked(spark):
    emb = load_table(spark, SF, "embeddings")
    books = PQ.pq_train(emb, dim=64, m_sub=2, k_codes=8, n_iter=2)
    codes = PQ.pq_encode(emb, books)
    qrows = [
        (int(r.vec_id), [float(x) for x in r.embedding])
        for r in emb.where(F.col("vec_id") < 3).collect()
    ]
    out = PQ.pq_adc_topk(codes, sorted(qrows), books, k=5).collect()
    assert len(out) == 15
    by_q = {}
    for r in out:
        by_q.setdefault(r.query_id, []).append(r)
    for rows in by_q.values():
        rows.sort(key=lambda r: r.rank)
        scores = [r.adc_score for r in rows]
        assert scores == sorted(scores, reverse=True)
        # sum of two cosines ∈ [-2, 2]
        assert all(-2.0 <= s <= 2.0 for s in scores)


def test_ivf_pq_neighbors_come_from_probed_cells_only(spark):
    from go_nonrat_annotation_pipeline_spark.operators.kmeans import kmeans_fit
    from go_nonrat_annotation_pipeline_spark.operators.pq import (
        _seq_dot,
        _seq_norm,
        ivf_pq_topk,
    )
    from go_nonrat_annotation_pipeline_spark.operators.similarity import (
        ivf_assign,
    )

    emb = load_table(spark, SF, "embeddings")
    coarse = kmeans_fit(emb, k=8, max_iter=2, early_stop=False)
    cents = sorted(
        (int(r.cent_id), [float(x) for x in r.cv]) for r in coarse.collect()
    )
    books = PQ.pq_train(emb, dim=64, m_sub=2, k_codes=8, n_iter=2)
    qrows = sorted(
        (int(r.vec_id), [float(x) for x in r.embedding])
        for r in emb.where(F.col("vec_id") < 5).collect()
    )
    out = ivf_pq_topk(emb, qrows, cents, books, n_probe=2, shortlist=20, k=5)
    rows = out.collect()
    assert {r.query_id for r in rows} == {0, 1, 2, 3, 4}

    # cell membership of every returned neighbor must be within the
    # query's two probed cells
    v = emb.selectExpr("vec_id", "embedding as v")
    cells = {
        r.vec_id: r.cell for r in ivf_assign(v, coarse, "vec_id", "v").collect()
    }
    for qid, qv in qrows:
        qn = _seq_norm(qv)
        probed = [
            cid
            for _, cid in sorted(
                (-(_seq_dot(qv, cv) / (qn * _seq_norm(cv))), cid)
                for cid, cv in cents
            )[:2]
        ]
        for r in rows:
            if r.query_id == qid:
                assert cells[r.neighbor_id] in probed
