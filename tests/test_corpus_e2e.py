"""Corpus-curation E2E funnel: monotonicity and accounting invariants."""

from __future__ import annotations

from go_nonrat_annotation_pipeline_spark.plans.registry import all_queries

SF = "/root/testdata/sf0.001"


def test_funnel_is_monotone_and_consistent(spark):
    rows = (
        all_queries()["corpus_curation_e2e"].spark(spark, SF).collect()
    )
    assert len(rows) > 0
    stages = [
        "n_raw",
        "n_pii_pass",
        "n_quality_pass",
        "n_exact_kept",
        "n_neardup_kept",
        "n_final",
    ]
    saw_shrink = {s: False for s in stages[1:]}
    for r in rows:
        vals = [r[s] for s in stages]
        # each stage only ever removes documents
        assert vals == sorted(vals, reverse=True), r
        for prev, cur in zip(stages, stages[1:]):
            if r[cur] < r[prev]:
                saw_shrink[cur] = True
        # token mass exists iff documents survived
        assert (r.final_tokens > 0) == (r.n_final > 0), r
        # survivors passed the >=40-token gate, so the mean holds
        if r.n_final:
            assert r.final_tokens >= 40 * r.n_final, r
    # across the corpus, at least the PII / quality / dedup stages must
    # each have actually removed something (the lacing guarantees SSN
    # docs exist, and the synthetic corpus contains short docs + dups)
    assert saw_shrink["n_pii_pass"]
    assert saw_shrink["n_quality_pass"]
    assert saw_shrink["n_exact_kept"] or saw_shrink["n_neardup_kept"]
