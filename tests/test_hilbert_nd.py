"""N-D Hilbert key: bijectivity, the defining neighbor property, and
cross-implementation agreement with an independent pure-Python Skilling
transform (AIP Conf. Proc. 707, 2004)."""

from __future__ import annotations

import itertools

import pytest
from pyspark.sql import functions as F

from go_nonrat_annotation_pipeline_spark.operators.hilbert_nd import (
    layout_by_hilbert,
    sql_hilbert_nd_ctes,
    with_hilbert_key_nd,
)


def _axes_to_transpose(X, b, n):
    X = list(X)
    M = 1 << (b - 1)
    Q = M
    while Q > 1:
        P = Q - 1
        for i in range(n):
            if X[i] & Q:
                X[0] ^= P
            else:
                t = (X[0] ^ X[i]) & P
                X[0] ^= t
                X[i] ^= t
        Q >>= 1
    for i in range(1, n):
        X[i] ^= X[i - 1]
    t = 0
    Q = M
    while Q > 1:
        if X[n - 1] & Q:
            t ^= Q - 1
        Q >>= 1
    return [x ^ t for x in X]


def _ref_index(coords, b, n):
    T = _axes_to_transpose(coords, b, n)
    h = 0
    for j in range(b - 1, -1, -1):
        for i in range(n):
            h = (h << 1) | ((T[i] >> j) & 1)
    return h


def test_hilbert3_bijective_and_neighbors(spark):
    b, n = 3, 3
    pts = list(itertools.product(range(1 << b), repeat=n))
    df = spark.createDataFrame(pts, "x long, y long, z long")
    rows = with_hilbert_key_nd(df, ["x", "y", "z"], bits=b).collect()
    assert sorted(r.hkey for r in rows) == list(range(len(pts)))
    by_key = {r.hkey: (r.x, r.y, r.z) for r in rows}
    for d in range(1, len(pts)):
        a, c = by_key[d - 1], by_key[d]
        assert sum(abs(a[i] - c[i]) for i in range(n)) == 1


@pytest.mark.parametrize("n,b", [(3, 8), (4, 4)])
def test_hilbert_nd_matches_reference(spark, n, b):
    import random

    rng = random.Random(42)
    pts = [
        tuple(rng.randrange(1 << b) for _ in range(n)) for _ in range(500)
    ]
    cols = [f"c{i}" for i in range(n)]
    schema = ", ".join(f"{c} long" for c in cols)
    df = spark.createDataFrame(pts, schema)
    rows = with_hilbert_key_nd(df, cols, bits=b).collect()
    for r in rows:
        coords = [r[c] for c in cols]
        assert r.hkey == _ref_index(coords, b, n)


def test_layout_by_hilbert_contiguous_segments(spark):
    b, n_files = 4, 8
    pts = list(itertools.product(range(1 << b), repeat=3))
    df = spark.createDataFrame(pts, "x long, y long, z long")
    out = layout_by_hilbert(df, ["x", "y", "z"], n_files, bits=b)
    assert out.columns == ["x", "y", "z"]  # key column dropped
    # each partition covers a contiguous, non-overlapping curve segment
    keyed = with_hilbert_key_nd(
        out.withColumn("pid", F.spark_partition_id()), ["x", "y", "z"], b
    )
    spans = (
        keyed.groupBy("pid")
        .agg(F.min("hkey").alias("lo"), F.max("hkey").alias("hi"))
        .orderBy("lo")
        .collect()
    )
    assert sum(1 for s in spans) <= n_files
    for prev, cur in zip(spans, spans[1:]):
        assert prev.hi < cur.lo


def test_hilbert_nd_input_validation(spark):
    df = spark.range(1).selectExpr("id AS a", "id AS b")
    with pytest.raises(ValueError, match="at least 2"):
        with_hilbert_key_nd(df, ["a"], bits=4)
    with pytest.raises(ValueError, match="overflows"):
        with_hilbert_key_nd(df, ["a", "b"], bits=32)
    # ADVICE r8: bits=1 used to die with an opaque IndexError deep in
    # the fold; it must be a ValueError at the API edge (both engines)
    with pytest.raises(ValueError, match="bits"):
        with_hilbert_key_nd(df, ["a", "b"], bits=1)
    with pytest.raises(ValueError, match="bits"):
        sql_hilbert_nd_ctes("src", 2, bits=1)
    with pytest.raises(ValueError, match="at least 2"):
        sql_hilbert_nd_ctes("src", 1, bits=4)
