"""Unit tests for the general-analytics operators (operators/asof.py,
operators/skew.py): each is checked against a naive same-semantics
reference implementation on in-memory frames, including the edge cases
the union-window formulation must get right (ties at the same instant,
keys with no prior right row, hot-key skew).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from go_nonrat_annotation_pipeline_spark.operators.asof import asof_join_backward
from go_nonrat_annotation_pipeline_spark.operators.skew import salted_collect_set


def test_asof_backward_matches_naive(spark):
    left = spark.createDataFrame(
        [
            ("u1", 10, "p1"),
            ("u1", 5, "p2"),   # before any click for u1 except ts=5 tie
            ("u2", 7, "p3"),
            ("u3", 1, "p4"),   # u3 has no clicks at all
            ("u1", 100, "p5"),
        ],
        "k string, ts long, pid string",
    )
    right = spark.createDataFrame(
        [
            ("u1", 5, "c1"),   # tie with left ts=5 → inclusive match
            ("u1", 9, "c2"),
            ("u1", 11, "c3"),  # after ts=10 → not visible to p1
            ("u1", 9, "c9"),   # duplicate instant → max payload wins
            ("u2", 7, "c4"),
            ("u2", 8, "c5"),
        ],
        "k string, ts long, cid string",
    )
    got = asof_join_backward(left, right, "k", "ts", "ts", ["cid"])
    rows = {(r.k, r.ts, r.pid): r.cid for r in got.collect()}
    assert rows == {
        ("u1", 10, "p1"): "c9",   # latest ≤10 is ts=9, max payload c9
        ("u1", 5, "p2"): "c1",    # inclusive tie
        ("u2", 7, "p3"): "c4",
        ("u3", 1, "p4"): None,    # no right rows for key
        ("u1", 100, "p5"): "c3",
    }
    assert got.count() == left.count()


def test_asof_backward_randomized_vs_naive(spark):
    import random

    rnd = random.Random(7)
    lrows = [
        (f"k{rnd.randint(0, 5)}", rnd.randint(0, 50), i) for i in range(200)
    ]
    rrows = [
        (f"k{rnd.randint(0, 5)}", rnd.randint(0, 50), 1000 + i)
        for i in range(150)
    ]
    left = spark.createDataFrame(lrows, "k string, ts long, lid long")
    right = spark.createDataFrame(rrows, "k string, ts long, rid long")
    got = {
        (r.k, r.ts, r.lid): r.rid
        for r in asof_join_backward(
            left, right, "k", "ts", "ts", ["rid"]
        ).collect()
    }
    # naive python reference
    by_key: dict[str, list[tuple[int, int]]] = {}
    for k, ts, rid in rrows:
        by_key.setdefault(k, []).append((ts, rid))
    want = {}
    for k, ts, lid in lrows:
        cands = [(t, r) for (t, r) in by_key.get(k, []) if t <= ts]
        # operator dedups per (key, ts) by max payload, then takes latest ts
        want[(k, ts, lid)] = (
            max(cands, key=lambda p: (p[0], p[1]))[1] if cands else None
        )
    assert got == want


def test_salted_collect_set_matches_plain(spark):
    # hot key 'A' holds 90% of rows — the shape salting exists for
    rows = [("A", f"v{i % 37}") for i in range(900)] + [
        ("B", f"v{i % 11}") for i in range(100)
    ]
    df = spark.createDataFrame(rows, "k string, v string")
    got = {
        r.k: r.tokens
        for r in salted_collect_set(df, ["k"], F.col("v"), n_salt=8).collect()
    }
    want = {
        r.k: r.tokens
        for r in df.groupBy("k")
        .agg(F.array_sort(F.collect_set("v")).alias("tokens"))
        .collect()
    }
    assert got == want
    assert len(got["A"]) == 37 and len(got["B"]) == 11


def test_salted_collect_set_plan_has_two_aggregates(spark):
    df = spark.range(1000).select(
        (F.col("id") % 3).cast("string").alias("k"),
        (F.col("id") % 100).cast("string").alias("v"),
    )
    out = salted_collect_set(df, ["k"], F.col("v"), n_salt=4)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # two-phase: an aggregate keyed on (k, salt) then one keyed on k
    assert plan.count("ObjectHashAggregate") + plan.count("SortAggregate") >= 2


def test_salted_join_matches_plain_join(spark):
    from go_nonrat_annotation_pipeline_spark.operators.skew import salted_join

    fact = spark.createDataFrame(
        [(k % 3, i) for i, k in enumerate(range(300))], "k long, v long"
    )
    dim = spark.createDataFrame(
        [(0, "a"), (1, "b"), (5, "zzz")], "k long, label string"
    )
    got = {
        (r.k, r.v, r.label)
        for r in salted_join(fact, dim, "k", n_salt=4).collect()
    }
    want = {(r.k, r.v, r.label) for r in fact.join(dim, "k").collect()}
    assert got == want and len(want) == 200

    # left join keeps unmatched fact rows exactly once
    got_l = salted_join(fact, dim, "k", n_salt=4, how="left")
    assert got_l.count() == 300
    assert got_l.where("label IS NULL").count() == 100


def test_chunk_text_reconstructs_document(spark):
    """Non-overlapping chunks (stride == chunk_size) concatenate back to
    the original text, in chunk_start order."""
    from go_nonrat_annotation_pipeline_spark.operators.sampling import chunk_text

    rows = [(1, "abcdefghij" * 7), (2, "short"), (3, "x" * 40), (4, "")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = chunk_text(df, "doc_id", "text", chunk_size=40, stride=40).collect()
    rebuilt = {}
    for r in sorted(out, key=lambda r: (r.doc_id, r.chunk_start)):
        rebuilt[r.doc_id] = rebuilt.get(r.doc_id, "") + r.chunk
    assert rebuilt == {i: t for i, t in rows}


def test_quota_sample_bounds_and_determinism(spark):
    from go_nonrat_annotation_pipeline_spark.operators.sampling import quota_sample

    df = spark.createDataFrame(
        [(i, f"s{i % 4}") for i in range(500)], "doc_id long, source string"
    )
    one = quota_sample(df, ["source"], "doc_id", 10)
    two = quota_sample(df, ["source"], "doc_id", 10)
    got1 = {(r.doc_id, r.source) for r in one.collect()}
    got2 = {(r.doc_id, r.source) for r in two.collect()}
    assert got1 == got2  # deterministic replay
    from collections import Counter

    per = Counter(s for _, s in got1)
    assert all(v == 10 for v in per.values()) and len(per) == 4


# ---------------------------------------------------------------------------
# AQE skew-join self-healing (the built-in alternative to manual salting)
# ---------------------------------------------------------------------------
def test_aqe_splits_skewed_join_partitions(spark):
    """With AQE skew-join handling on (session.py default), a join
    where one key owns half the left side completes with the skewed
    partition SPLIT at runtime — the adaptive plan reports
    'skew=true' on the sort-merge join. The manual-salting operators
    (operators/skew.py) remain for aggregation paths AQE can't split."""
    from pyspark.sql import functions as F

    n = 200_000
    left = spark.range(n).select(
        F.when(F.col("id") % 2 == 0, F.lit(0))
        .otherwise(F.pmod(F.col("id"), 503))
        .alias("k"),
        F.col("id").alias("v"),
    )
    right = spark.range(503).select(
        F.col("id").alias("k"), (F.col("id") * 7).alias("w")
    )
    old = {
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": spark.conf.get(
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor", "5"
        ),
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": spark.conf.get(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "256MB"
        ),
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": spark.conf.get(
            "spark.sql.adaptive.advisoryPartitionSizeInBytes", "64MB"
        ),
        "spark.sql.autoBroadcastJoinThreshold": spark.conf.get(
            "spark.sql.autoBroadcastJoinThreshold"
        ),
    }
    try:
        # thresholds low enough that the toy skew qualifies
        spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB"
        )
        spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64KB")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = left.join(right, "k")
        # collect() executes THIS DataFrame's query execution (count()
        # would build a separate aggregate plan, leaving this one
        # unexecuted with isFinalPlan=false)
        assert len(joined.collect()) == n
        final = joined._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in final, final[:2000]
    finally:
        for key, val in old.items():
            spark.conf.set(key, val)
