from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from go_nonrat_annotation_pipeline_spark.operators.binpack import ffd_pack


@pytest.fixture(scope="module")
def docs(spark):
    # words = token count; ids chosen to scatter across shards
    rows = [
        (i, " ".join(["w"] * n))
        for i, n in enumerate(
            [90, 80, 70, 60, 50, 40, 30, 20, 10, 5, 100, 64, 64, 63, 1]
            * 4
        )
    ]
    return spark.createDataFrame(rows, "doc_id long, text string").cache()


def _ffd_reference(sizes_ids, cap):
    loads, assign = [], {}
    for t, i in sorted(sizes_ids, key=lambda p: (-p[0], p[1])):
        for b, ld in enumerate(loads):
            if ld + t <= cap:
                loads[b] += t
                assign[i] = b + 1
                break
        else:
            loads.append(t)
            assign[i] = len(loads)
    return assign, loads


def test_capacity_and_coverage(spark, docs):
    cap = 128
    out = ffd_pack(docs, bin_cap=cap, n_shards=4).collect()
    assert len(out) == docs.count()  # every doc placed exactly once
    fills: dict[tuple, int] = {}
    for r in out:
        fills[(r.shard, r.bin_no)] = fills.get((r.shard, r.bin_no), 0) + r.tok
    assert all(v <= cap for v in fills.values())


def test_matches_reference_ffd_per_shard(spark, docs):
    cap = 128
    out = ffd_pack(docs, bin_cap=cap, n_shards=4)
    by_shard: dict[int, list] = {}
    for r in out.collect():
        by_shard.setdefault(r.shard, []).append(r)
    for shard, rows in by_shard.items():
        assign, _ = _ffd_reference([(r.tok, r.doc_id) for r in rows], cap)
        for r in rows:
            assert r.bin_no == assign[r.doc_id], (shard, r.doc_id)


def test_oversized_docs_excluded(spark):
    df = spark.createDataFrame(
        [(1, " ".join(["w"] * 10)), (2, " ".join(["w"] * 300))],
        "doc_id long, text string",
    )
    out = ffd_pack(df, bin_cap=128, n_shards=2).collect()
    assert [r.doc_id for r in out] == [1]


def test_deterministic_across_repartition(spark, docs):
    a = sorted(map(tuple, ffd_pack(docs, n_shards=4).collect()))
    b = sorted(
        map(tuple, ffd_pack(docs.repartition(7), n_shards=4).collect())
    )
    assert a == b
