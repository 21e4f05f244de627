"""Distributed ranking operator: exactness against brute force.

value_rank2 assembles global tie-averaged ranks from range-partitioned
local ranks + prefix offsets; these tests pin that the assembly is
exact for arbitrary duplicate-heavy data and any bucket count
(boundary placement must never matter), and that doubled average
ranks are what the definition says: 2r + c - 1 for a tie group of c
occupying min-rank r."""

from __future__ import annotations

import random

import pytest

from go_nonrat_annotation_pipeline_spark.operators.ranking import (
    value_rank2,
)
from go_nonrat_annotation_pipeline_spark.session import get_spark


@pytest.fixture(scope="module")
def spark():
    return get_spark("test_ranking", shuffle_partitions=8)


def brute_rank2(values):
    s = sorted(values)
    out = {}
    for v in set(values):
        r = s.index(v) + 1  # min rank
        c = values.count(v)
        out[v] = (c, 2 * r + c - 1)
    return out


@pytest.mark.parametrize("seed,buckets", [(0, 4), (1, 7), (2, 32)])
def test_matches_brute_force(spark, seed, buckets):
    rng = random.Random(seed)
    vals = [rng.randrange(0, 25) for _ in range(300)]  # heavy ties
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    got = {
        r.v: (r.cnt, r.rank2)
        for r in value_rank2(df, "v", buckets=buckets).collect()
    }
    assert got == brute_rank2(vals)


def test_more_buckets_than_values(spark):
    df = spark.createDataFrame([(1,), (1,), (2,)], "v long")
    got = {
        r.v: (r.cnt, r.rank2)
        for r in value_rank2(df, "v", buckets=64).collect()
    }
    # ranks: value 1 occupies [1,2] -> rank2 = 3; value 2 is rank 3 -> 6
    assert got == {1: (2, 3), 2: (1, 6)}


def test_nulls_excluded(spark):
    df = spark.createDataFrame([(1,), (None,), (2,)], "v long")
    got = {r.v for r in value_rank2(df, "v").collect()}
    assert got == {1, 2}
