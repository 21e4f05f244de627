"""Benchmark decontamination (operators/decontam.py): planted overlaps
are caught, the clean remainder really is clean, and short docs are
clean by definition."""

from __future__ import annotations

from pyspark.sql import functions as F

from go_nonrat_annotation_pipeline_spark.operators import decontam as DC

BENCH_SENT = "the quick brown fox jumps over the lazy dog tonight again"


def _frames(spark):
    corpus = spark.createDataFrame(
        [
            # contains the full benchmark sentence verbatim -> dirty
            (1, "intro words " + BENCH_SENT + " trailing words"),
            # shares only a 5-gram prefix, below n=8 -> clean
            (2, "the quick brown fox jumps through entirely different text "
                "padding padding padding"),
            (3, "completely unrelated content with many many words that do "
                "not overlap the benchmark at all"),
            (4, "short doc"),  # < n words: zero grams, clean
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(100, BENCH_SENT)], "doc_id long, text string"
    )
    return corpus, bench


def test_verdicts_flag_planted_overlap(spark):
    corpus, bench = _frames(spark)
    v = {r.doc_id: r for r in DC.contamination_verdicts(corpus, bench).collect()}
    assert set(v) == {1, 2, 3, 4}
    assert v[1].contaminated and v[1].n_hits >= 1
    assert not v[2].contaminated  # 5-gram overlap is below the 8-gram rule
    assert not v[3].contaminated
    assert v[4].n_grams == 0 and not v[4].contaminated


def test_decontaminate_removes_exactly_the_dirty_docs(spark):
    corpus, bench = _frames(spark)
    clean = DC.decontaminate(corpus, bench)
    assert sorted(r.doc_id for r in clean.select("doc_id").collect()) == [2, 3, 4]
    # the survivors re-checked against the benchmark: zero hits
    v2 = DC.contamination_verdicts(clean, bench)
    assert v2.where("contaminated").count() == 0


def test_lower_n_catches_shorter_overlaps(spark):
    corpus, bench = _frames(spark)
    v = {
        r.doc_id: r.contaminated
        for r in DC.contamination_verdicts(corpus, bench, n=5).collect()
    }
    assert v[1] and v[2] and not v[3]  # the 5-gram prefix now collides


def test_broadcast_probe_shape(spark):
    """The benchmark side must reach the corpus probe as a broadcast —
    the 100 TB contract (corpus never shuffles for the membership test)."""
    corpus, bench = _frames(spark)
    plan = DC.contamination_verdicts(corpus, bench)._jdf.queryExecution(
    ).executedPlan().toString()
    assert "BroadcastHashJoin" in plan
