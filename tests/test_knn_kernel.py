"""The r13 Arrow-kernel candidate generator must emit a SUPERSET of
the exact answer set on adversarial data — rounding-boundary ties,
clustered benches where the cell bounds actually prune, duplicate
vectors, and tiny benches (B < k). The downstream exact re-rank is
oracle arithmetic; these tests pin the superset property the module
doc proves, plus end-to-end equality of the re-ranked result with
driver-side brute force.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import Window, functions as F

from go_nonrat_annotation_pipeline_spark.operators.decontam_ann import (
    build_bench_cells,
)
from go_nonrat_annotation_pipeline_spark.operators.dedup import cosine
from go_nonrat_annotation_pipeline_spark.operators.knn_kernel import (
    driver_train_sample,
    gate_candidate_ids,
    topk_candidate_ids,
)

_DIM = 8


def _cos(a, b):
    dot = 0.0
    for x, y in zip(a, b):
        dot = dot + x * y
    na = 0.0
    for x in a:
        na = na + x * x
    nb = 0.0
    for y in b:
        nb = nb + y * y
    return dot / (math.sqrt(na) * math.sqrt(nb))


def _vec(seed: int, cluster: int = 0):
    # deterministic full-mantissa-ish vectors in a few tight clusters
    # (clustered bench = the regime where the cell bounds prune)
    base = [math.sin(cluster * 7.7 + d) for d in range(_DIM)]
    return [
        base[d] + 0.01 * math.sin(seed * 13.3 + d * 2.1)
        for d in range(_DIM)
    ]


@pytest.fixture(scope="module")
def data(spark):
    bench_rows = [
        (i, _vec(i, cluster=i % 3)) for i in range(40)
    ]
    corpus_rows = [
        (100 + i, _vec(i * 17, cluster=i % 3)) for i in range(60)
    ]
    # adversarial extras: an exact duplicate of a bench vector (cosine
    # exactly 1 with it, rounding ties with near-duplicates)
    corpus_rows.append((999, list(bench_rows[5][1])))
    corpus = spark.createDataFrame(
        corpus_rows, "vec_id long, vc array<double>"
    )
    return bench_rows, corpus_rows, corpus


def test_topk_matches_bruteforce(spark, data):
    bench_rows, corpus_rows, corpus = data
    k = 5
    sample = driver_train_sample(bench_rows, target=10)
    _, cells = build_bench_cells(sample, k=4)
    cand = topk_candidate_ids(spark, F.col("vc"), bench_rows, cells, k)
    bench_b = spark.createDataFrame(
        bench_rows, "bench_id long, vb array<double>"
    )
    w = Window.partitionBy("vec_id").orderBy(
        F.desc("cosine"), F.asc("bench_id")
    )
    got = {
        (r.vec_id, r.rank, r.bench_id, r.cosine)
        for r in (
            corpus.select(
                "vec_id", "vc", F.explode(cand).alias("bench_id")
            )
            .join(F.broadcast(bench_b), "bench_id")
            .withColumn(
                "cosine", F.round(cosine(F.col("vc"), F.col("vb")), 6)
            )
            .withColumn("rank", F.row_number().over(w).cast("long"))
            .where(F.col("rank") <= k)
            .collect()
        )
    }
    # driver-side brute force with the same rounding + tiebreak
    want = set()
    for vid, vc in corpus_rows:
        scored = sorted(
            ((round(_cos(vc, vb), 6), bid) for bid, vb in bench_rows),
            key=lambda t: (-t[0], t[1]),
        )
        for rank, (c, bid) in enumerate(scored[:k], start=1):
            want.add((vid, rank, bid, c))
    assert got == want


def test_gate_matches_bruteforce(spark, data):
    bench_rows, corpus_rows, corpus = data
    th = 0.9995
    sample = driver_train_sample(bench_rows, target=10)
    _, cells = build_bench_cells(sample, k=4)
    cand = gate_candidate_ids(spark, F.col("vc"), bench_rows, cells, th)
    bench_b = spark.createDataFrame(
        bench_rows, "bench_id long, vb array<double>"
    )
    got = {
        (r.vec_id, r.bench_id, r.cosine)
        for r in (
            corpus.select(
                "vec_id", "vc", F.explode(cand).alias("bench_id")
            )
            .join(F.broadcast(bench_b), "bench_id")
            .withColumn(
                "cosine", F.round(cosine(F.col("vc"), F.col("vb")), 6)
            )
            .groupBy("vec_id")
            .agg(
                F.max(
                    F.struct(
                        F.col("cosine"),
                        (-F.col("bench_id")).alias("nbid"),
                    )
                ).alias("_b")
            )
            .where(F.col("_b.cosine") >= F.lit(th))
            .select(
                "vec_id",
                (-F.col("_b.nbid")).cast("long").alias("bench_id"),
                F.col("_b.cosine").alias("cosine"),
            )
            .collect()
        )
    }
    want = set()
    for vid, vc in corpus_rows:
        best = max(
            ((round(_cos(vc, vb), 6), -bid) for bid, vb in bench_rows)
        )
        if best[0] >= th:
            want.add((vid, -best[1], best[0]))
    assert got == want


def test_topk_small_bench_and_empty_sample(spark):
    # B < k: every bench id must be emitted (exact stage sees all)
    bench_rows = [(i, _vec(i)) for i in range(3)]
    corpus = spark.createDataFrame(
        [(7, _vec(99))], "vec_id long, vc array<double>"
    )
    _, cells = build_bench_cells(
        driver_train_sample(bench_rows, target=2), k=4
    )
    cand = topk_candidate_ids(spark, F.col("vc"), bench_rows, cells, 5)
    [row] = corpus.select(F.explode(cand).alias("b")).groupBy().agg(
        F.sort_array(F.collect_list("b")).alias("bs")
    ).collect()
    assert row.bs == [0, 1, 2]


def test_driver_train_sample_caps(spark):
    rows = [(i, [float(i)]) for i in range(10_000)]
    out = driver_train_sample(rows, target=100)
    assert 0 < len(out) < 1_000  # ~target, never the full table
