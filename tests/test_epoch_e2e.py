"""Pack ↔ epoch-shuffle composition (plans/queries_epoch_e2e.py):
pack integrity must hold per epoch while the two epochs decorrelate,
and the pack window must stay hash-partitioned by shard (no global
sort creeps into the composition)."""

from __future__ import annotations

from go_nonrat_annotation_pipeline_spark.plans.queries_epoch_e2e import (
    corpus_epoch_e2e,
)

SF = "/root/testdata/sf0.001"


def test_integrity_and_decorrelation(spark):
    r = corpus_epoch_e2e(spark, SF).collect()[0]
    # every tokenizable doc exactly once per epoch, and the join is total
    assert r.n_docs == r.n_docs_e1 == r.n_joined > 0
    # a permutation moves tokens, never creates or drops them
    assert r.tok_total_e0 == r.tok_total_e1 > 0
    # each shard's stream is gap- and overlap-free in both epochs
    assert r.contig_defect_e0 == 0 == r.contig_defect_e1
    # decorrelation: survival near 1/n_shards (8), not near 1
    assert r.n_same_shard < r.n_docs * 0.3
    assert r.n_fixed_goff <= max(1, r.n_docs // 100)
    assert r.sum_abs_goff_disp > 0


def test_pack_window_stays_sharded(spark):
    df = corpus_epoch_e2e(spark, SF)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    # the corpus-sized windows are the two per-shard prefix sums —
    # they must hash-partition by shard; the only unpartitioned
    # windows are the n_shards-row (8-row) offset prefix sums
    assert "hashpartitioning(shard" in plan
