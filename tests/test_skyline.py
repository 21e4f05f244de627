"""Two-phase distributed skyline: property checks against brute force.

The registered query pins one instance; these tests pin the ALGORITHM:
for arbitrary integer point sets (duplicates, dominated chains, ties on
either axis), bucket-local pass -> global pass must equal the O(n^2)
dominance definition, and phase 1 must never drop a global-skyline
point (superset property)."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from go_nonrat_annotation_pipeline_spark.plans.queries_skyline import (
    _skyline_pass,
)
from go_nonrat_annotation_pipeline_spark.session import get_spark


@pytest.fixture(scope="module")
def spark():
    return get_spark("test_skyline", shuffle_partitions=8)


def brute_skyline(pts):
    out = []
    for i, (x, y) in pts:
        dominated = any(
            (qx >= x and qy >= y and (qx > x or qy > y))
            for j, (qx, qy) in pts
            if j != i
        )
        if not dominated:
            out.append((i, x, y))
    return sorted(out)


def two_phase(spark, pts):
    df = spark.createDataFrame(
        [(i, x, y) for i, (x, y) in pts], "doc_id long, x long, y long"
    )
    bucketed = df.withColumn(
        "_b", F.crc32(F.col("doc_id").cast("string")) % 4
    )
    cand = _skyline_pass(bucketed, F.col("_b")).drop("_b")
    sky = _skyline_pass(cand, F.col("doc_id") % 1)
    return cand, sky


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_matches_brute_force(spark, seed):
    rng = random.Random(seed)
    pts = [
        (i, (rng.randrange(0, 20), rng.randrange(0, 20)))
        for i in range(120)
    ]
    _, sky = two_phase(spark, pts)
    got = sorted((r.doc_id, r.x, r.y) for r in sky.collect())
    assert got == brute_skyline(pts)


def test_phase1_is_superset(spark):
    rng = random.Random(7)
    pts = [
        (i, (rng.randrange(0, 15), rng.randrange(0, 15)))
        for i in range(200)
    ]
    cand, _ = two_phase(spark, pts)
    cand_ids = {r.doc_id for r in cand.collect()}
    assert {i for i, _, _ in brute_skyline(pts)} <= cand_ids


def test_duplicate_points_all_survive(spark):
    # equal points do not dominate each other (no strict objective):
    # every copy of the maximal point must be in the skyline
    pts = [(1, (5, 5)), (2, (5, 5)), (3, (3, 9)), (4, (2, 2))]
    _, sky = two_phase(spark, pts)
    got = sorted((r.doc_id, r.x, r.y) for r in sky.collect())
    assert got == brute_skyline(pts) == [(1, 5, 5), (2, 5, 5), (3, 3, 9)]
