"""Round-12 hardening of the lossless ball-bound family
(operators/decontam_ann): capped-size training sample, hot-cell drain,
and the empty-cells guards (ADVICE r11 #2/#3, VERDICT r11 Next #2/#3).
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from go_nonrat_annotation_pipeline_spark.operators.decontam_ann import (
    build_bench_cells,
    compatible_cell_pairs,
    pair_radius,
    probe_cells,
    refine_hot_cells,
    residual_to_cell,
    train_sample,
)
from go_nonrat_annotation_pipeline_spark.operators.dedup import cosine
from go_nonrat_annotation_pipeline_spark.operators.similarity import (
    argmax_cell,
)


def _clustered(seed, n_anchors, n, dim=16, spread=0.02, hot_frac=0.0):
    """Clustered unit vectors; with hot_frac > 0, that fraction of rows
    piles onto anchor 0 (a saturated cell for the drain test)."""
    rng = np.random.default_rng(seed)
    A = rng.normal(size=(n_anchors, dim))
    A /= np.linalg.norm(A, axis=1, keepdims=True)
    out = []
    n_hot = int(n * hot_frac)
    for i in range(n):
        a = 0 if i < n_hot else (i % n_anchors)
        v = A[a] + spread * rng.normal(size=dim)
        out.append((i, [float(x) for x in v / np.linalg.norm(v)]))
    return out


def test_train_sample_is_capped_not_fractional(spark):
    """The collect is O(target) rows at ANY corpus size — doubling the
    corpus must NOT double the sample (the r11 fixed-fraction defect)."""
    rows = [(i, [float(i % 7), 1.0]) for i in range(12_000)]
    df = spark.createDataFrame(rows, "vec_id long, v array<double>")
    s1 = train_sample(df, "vec_id", "v", target=500)
    big = spark.createDataFrame(
        [(i, [float(i % 7), 1.0]) for i in range(24_000)],
        "vec_id long, v array<double>",
    )
    s2 = train_sample(big, "vec_id", "v", target=500)
    # crc32 is uniform: expected 500, allow wide slack either side
    assert 200 <= len(s1) <= 1100, len(s1)
    assert 200 <= len(s2) <= 1100, len(s2)
    # and a small table collects everything (modulus 1)
    small = spark.createDataFrame(rows[:300], "vec_id long, v array<double>")
    assert len(train_sample(small, "vec_id", "v", target=500)) == 300


def test_train_sample_empty_input(spark):
    df = spark.createDataFrame([], "vec_id long, v array<double>")
    assert train_sample(df, "vec_id", "v") == []


def test_probe_cells_empty_guard_both_paths(spark):
    """ADVICE r11 #3: kernel path must share the empty-cells guard —
    with zero cells both forms return an empty probe array, not a
    numpy shape error / sequence(1, 0) descent."""
    df = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0])], "vec_id long, v array<double>"
    )
    for kernel in (False, True):
        got = df.select(
            probe_cells(F.col("v"), [], 0.9, kernel=kernel).alias("p")
        ).collect()
        assert [list(r.p) for r in got] == [[], []]


def test_registered_exact_pairs_empty_table(spark, tmp_path):
    """ADVICE r11 #2: an empty embeddings table yields the empty pair
    frame (typed), not an element_at error over zero centroids."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from go_nonrat_annotation_pipeline_spark.plans.queries_dedup_exact_cells import (
        dedup_embedding_exact_pairs,
    )

    schema = pa.schema(
        [
            ("vec_id", pa.int64()),
            ("embedding", pa.list_(pa.float32())),
            ("label", pa.int32()),
        ]
    )
    pq.write_table(schema.empty_table(), str(tmp_path / "embeddings.parquet"))
    out = dedup_embedding_exact_pairs(spark, str(tmp_path))
    assert out.columns == ["vec_id_a", "vec_id_b", "cosine"]
    assert out.count() == 0


def test_refine_hot_cells_drains_and_stays_exact(spark):
    """The drain: a deliberately saturated cell (60% of rows on one
    anchor, hot_cap well below its occupancy) is re-split; the refined
    cell table cuts cell-level candidates while the exact pair set is
    IDENTICAL (the bound is cell-agnostic)."""
    th = 0.9
    vecs = _clustered(seed=21, n_anchors=8, n=800, hot_frac=0.6)
    df = spark.createDataFrame(
        vecs, "vec_id long, v array<double>"
    ).coalesce(4)
    sample = train_sample(df, "vec_id", "v", target=400)
    _, cells = build_bench_cells(sample, k=4)
    cents0 = [(cid, cv) for cid, cv, _ in cells]

    def run(cent_rows):
        assigned = df.select(
            "vec_id",
            "v",
            argmax_cell(F.col("v"), cent_rows).alias("cell"),
        ).withColumn(
            "res", residual_to_cell(F.col("v"), F.col("cell"), cent_rows)
        )
        maxres = {
            r[0]: r[1]
            for r in assigned.groupBy("cell")
            .agg(F.max("res").alias("res"))
            .collect()
        }
        full = [(c, cv, float(maxres.get(c, 0.0))) for c, cv in cent_rows]
        compat = spark.createDataFrame(
            compatible_cell_pairs(full, th, with_dist=True),
            "ca long, cb long, dctr double",
        )
        a = assigned.select(
            F.col("vec_id").alias("ia"), F.col("v").alias("va"),
            F.col("cell").alias("ca"), F.col("res").alias("res_a"),
        )
        b = assigned.select(
            F.col("vec_id").alias("ib"), F.col("v").alias("vb"),
            F.col("cell").alias("cb"), F.col("res").alias("res_b"),
        )
        cand = (
            a.join(F.broadcast(compat), "ca")
            .join(b, "cb")
            .where(F.col("ia") < F.col("ib"))
        )
        n_cell_cand = cand.count()
        pairs = {
            (r.ia, r.ib)
            for r in cand.where(
                F.col("dctr")
                <= F.col("res_a") + F.lit(pair_radius(th) + 1e-6) + F.col("res_b")
            )
            .withColumn("c", F.round(cosine(F.col("va"), F.col("vb")), 6))
            .where(F.col("c") >= th)
            .collect()
        }
        return n_cell_cand, pairs

    n0, pairs0 = run(cents0)
    refined = refine_hot_cells(
        df, "vec_id", "v", cents0, hot_cap=150, k_sub=4, sub_target=200
    )
    assert len(refined) > len(cents0)
    # contiguous 1-based ids (the argmax/residual contract)
    assert [c for c, _ in refined] == list(range(1, len(refined) + 1))
    n1, pairs1 = run(refined)
    assert pairs1 == pairs0 and pairs0  # exactness, non-trivially
    assert n1 < n0, (n1, n0)  # the drain actually cut candidates

    # numpy ground truth: zero false negatives end-to-end
    V = np.asarray([v for _, v in vecs])
    Vh = V / np.linalg.norm(V, axis=1, keepdims=True)
    cos = np.round(Vh @ Vh.T, 6)
    want = {
        (i, j)
        for i in range(len(vecs))
        for j in range(i + 1, len(vecs))
        if cos[i, j] >= th
    }
    assert pairs1 == want


def test_refine_hot_cells_noop_below_cap(spark):
    """No hot cell -> the cell table is returned unchanged (the
    registered query's plan at test SFs is byte-identical to r11)."""
    vecs = _clustered(seed=5, n_anchors=4, n=200)
    df = spark.createDataFrame(vecs, "vec_id long, v array<double>")
    _, cells = build_bench_cells(vecs, k=4)
    cents = [(cid, cv) for cid, cv, _ in cells]
    assert refine_hot_cells(df, "vec_id", "v", cents, hot_cap=4000) == cents
