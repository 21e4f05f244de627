from __future__ import annotations

from pyspark.sql import functions as F

from go_nonrat_annotation_pipeline_spark.plans.registry import all_queries

SF = "/root/testdata/sf0.001"


def test_layout_funnel_invariants(spark):
    q = all_queries()["corpus_layout_e2e"]
    out = q.spark(spark, SF).cache()
    rows = out.collect()
    assert len(rows) == 20  # every source reported, even if zeroed
    for r in rows:
        # monotone funnel
        assert r.n_input >= r.n_quality >= r.n_sampled >= 0
        # tokens only from sampled docs; sequences only where tokens
        assert (r.n_tokens > 0) == (r.n_sampled > 0) or r.n_tokens == 0
        assert (r.n_seqs_touched > 0) == (r.n_tokens > 0)
    # quality gate keeps about half per source (rank percentile exact)
    tot = out.agg(
        F.sum("n_input").alias("i"), F.sum("n_quality").alias("q"),
        F.sum("n_sampled").alias("s"),
    ).first()
    assert 0.4 * tot.i <= tot.q <= 0.6 * tot.i
    # mixture targets half the selected pool
    assert 0.3 * tot.q <= tot.s <= 0.7 * tot.q
