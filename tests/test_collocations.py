"""PMI collocations (operators/collocations.py): a planted collocation
outranks frequent-but-independent pairs, counts are exact, min_count
prunes."""

from __future__ import annotations

from pyspark.sql import functions as F

from go_nonrat_annotation_pipeline_spark.operators import collocations as CO


def _docs(spark):
    # "hong kong" always collocates; "the" is frequent and promiscuous
    rows = [(i, "the visit to hong kong was the best the trip had") for i in range(10)]
    rows += [(100 + i, "the cat sat on the mat near the door") for i in range(10)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_planted_collocation_in_top_tie_group(spark):
    # once-per-doc word pairs all tie at the max ratio — the planted
    # collocation must be among them, and any pair involving the
    # promiscuous word "the" must not be
    scored = CO.bigram_pmi(_docs(spark), min_count=5).collect()
    best = max(r.pmi_ratio_ppm for r in scored)
    top = {(r.w1, r.w2) for r in scored if r.pmi_ratio_ppm == best}
    assert ("hong", "kong") in top
    assert not any("the" in pair for pair in top)
    hk = next(r for r in scored if (r.w1, r.w2) == ("hong", "kong"))
    assert hk.n_xy == 10 and hk.n_x == 10 and hk.n_y == 10


def test_counts_exact_and_min_count_prunes(spark):
    scored = CO.bigram_pmi(_docs(spark), min_count=5)
    rows = {(r.w1, r.w2): r for r in scored.collect()}
    assert all(r.n_xy >= 5 for r in rows.values())
    # "the best" occurs 10x; "the" occurs 6x per doc family... exact check:
    the = rows[("the", "best")]
    assert the.n_xy == 10
    assert the.n_x == 60  # 3 per doc x 10 + 3 per doc x 10
    # a frequent-word pair scores far below the planted collocation
    hk = rows[("hong", "kong")]
    assert hk.pmi_ratio_ppm > 3 * the.pmi_ratio_ppm
