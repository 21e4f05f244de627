"""Corpus-refresh E2E ledger: CDC class accounting and admission gates."""

from __future__ import annotations

from go_nonrat_annotation_pipeline_spark.plans.registry import all_queries

SF = "/root/testdata/sf0.001"


def test_ledger_accounting(spark):
    rows = all_queries()["corpus_refresh_e2e"].spark(spark, SF).collect()
    assert len(rows) > 0
    tot = {
        k: sum(r[k] for r in rows)
        for k in (
            "n_keys",
            "n_added",
            "n_changed",
            "n_deleted",
            "n_unchanged",
            "n_incoming_dup",
            "n_admitted",
        )
    }
    # classes partition the key space
    assert (
        tot["n_added"] + tot["n_changed"] + tot["n_deleted"]
        + tot["n_unchanged"]
        == tot["n_keys"]
    )
    # the derivation guarantees every class occurs
    for k in ("n_added", "n_changed", "n_deleted", "n_unchanged"):
        assert tot[k] > 0, k
    # admission: flagged + admitted = incoming (added + changed)
    assert (
        tot["n_incoming_dup"] + tot["n_admitted"]
        == tot["n_added"] + tot["n_changed"]
    )
    # the synthetic corpus has near-dups, so the gate must actually fire
    assert tot["n_incoming_dup"] > 0
    per_row_ok = all(
        r.n_incoming_dup + r.n_admitted == r.n_added + r.n_changed
        for r in rows
    )
    assert per_row_ok
