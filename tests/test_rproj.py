from __future__ import annotations

import math

import numpy as np
import pytest

from pyspark.sql import functions as F

from go_nonrat_annotation_pipeline_spark.operators import rproj as RP


@pytest.fixture(scope="module")
def embs(spark):
    rng = np.random.RandomState(7)
    rows = [
        (int(i), [float(x) for x in rng.randn(16)]) for i in range(40)
    ]
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>"
    ).cache()


def _wide_rows(df):
    return {r.vec_id: list(r.proj) for r in df.collect()}


def test_kernel_agrees_with_expression(spark, embs):
    wide = _wide_rows(RP.rproject_wide(embs, 16, k=8))
    kern = _wide_rows(RP.rproject_kernel(embs, 16, k=8))
    assert wide == kern  # bit-identical int64 on both paths


def test_projection_matches_numpy(spark, embs):
    S = np.array(
        [[RP._sign(d, j) for j in range(1, 9)] for d in range(1, 17)],
        dtype=np.int64,
    )
    got = _wide_rows(RP.rproject_wide(embs, 16, k=8))
    for r in embs.collect():
        q = np.floor(
            np.array(r.embedding, dtype=np.float64) * RP.Q_SCALE
        ).astype(np.int64)
        assert got[r.vec_id] == list(q @ S), r.vec_id


def test_sign_matrix_is_balanced(spark):
    # md5-derived signs should be ~half +1 (sanity on the hash derivation)
    signs = [s for (_, _, s) in RP.sign_matrix(64, 16)]
    frac = sum(1 for s in signs if s == 1) / len(signs)
    assert 0.4 < frac < 0.6


def test_jl_preserves_inner_products(spark):
    # E[<Px, Py>] = k * <x, y> for ±1 signed projection; check the
    # normalized estimate lands within a loose concentration band.
    rng = np.random.RandomState(3)
    d, k = 64, 32
    x = rng.randn(d)
    y = x + 0.1 * rng.randn(d)  # strongly correlated pair
    rows = [(0, [float(v) for v in x]), (1, [float(v) for v in y])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    proj = _wide_rows(RP.rproject_wide(df, d, k=k))
    px, py = np.array(proj[0]), np.array(proj[1])
    qx = np.floor(x * RP.Q_SCALE)
    qy = np.floor(y * RP.Q_SCALE)
    true_dot = float(qx @ qy)
    est = float(px @ py) / k
    # ±1 JL estimator variance ~ (|x|²|y|²)/k; allow 4 sigma
    sigma = math.sqrt(
        float((qx @ qx) * (qy @ qy)) / k
    )
    assert abs(est - true_dot) < 4 * sigma


def test_long_form_matches_wide(spark, embs):
    long = RP.rproject(embs, 16, k=8)
    wide = _wide_rows(RP.rproject_wide(embs, 16, k=8))
    for r in long.collect():
        assert wide[r.vec_id][r.j - 1] == r.p
