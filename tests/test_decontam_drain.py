"""Candidate-aware drain (operators/decontam_drain) — exactness under
re-split, load-triggered firing where occupancy never trips, and the
registered drained twin's equality with the undrained row at test SFs.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from go_nonrat_annotation_pipeline_spark.operators.decontam_ann import (
    build_bench_cells,
    compatible_cell_pairs,
    pair_radius,
    residual_to_cell,
)
from go_nonrat_annotation_pipeline_spark.operators.decontam_drain import (
    cell_candidate_loads,
    drain_saturated_cells,
)
from go_nonrat_annotation_pipeline_spark.operators.dedup import cosine
from go_nonrat_annotation_pipeline_spark.operators.similarity import (
    argmax_cell,
)

SF = "/root/testdata/sf0.001"


def _outlier_clusters(seed, n_anchors, n, dim=16, spread=0.04, out_frac=0.05):
    """Tight clusters with a sprinkle of far outliers per cluster — the
    r11 saturation geometry: balanced occupancy, but the outliers
    inflate every cell's MAX residual until most cell pairs stay
    compatible (an occupancy cap never fires; candidate load does)."""
    rng = np.random.default_rng(seed)
    A = rng.normal(size=(n_anchors, dim))
    A /= np.linalg.norm(A, axis=1, keepdims=True)
    out = []
    for i in range(n):
        s = spread if rng.random() > out_frac else 0.6
        v = A[i % n_anchors] + s * rng.normal(size=dim)
        out.append((i, [float(x) for x in v / np.linalg.norm(v)]))
    return out


def _run(spark, df, cent_rows, th):
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
    n_cell = cand.count()
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
    return n_cell, pairs


def test_load_trigger_fires_where_occupancy_cannot(spark):
    """Balanced cells + outlier-dense compat graph: the occupancy view
    sees nothing hot, the candidate-load view drains, the result set is
    identical to numpy ground truth and candidates drop."""
    th = 0.9
    vecs = _outlier_clusters(seed=31, n_anchors=8, n=640)
    df = spark.createDataFrame(
        vecs, "vec_id long, v array<double>"
    ).coalesce(4)
    _, cells = build_bench_cells(vecs, k=8)
    cents0 = [(cid, cv) for cid, cv, _ in cells]
    n0, pairs0 = _run(spark, df, cents0, th)
    # balanced: no cell over half the corpus, yet candidates saturate
    refined = drain_saturated_cells(
        df, "vec_id", "v", cents0, threshold=th,
        cand_cap=20_000, k_sub=4, sub_target=400, max_rounds=2,
    )
    assert len(refined) > len(cents0)
    assert [c for c, _ in refined] == list(range(1, len(refined) + 1))
    n1, pairs1 = _run(spark, df, refined, th)
    assert pairs1 == pairs0 and pairs0
    assert n1 < n0, (n1, n0)
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


def test_noop_below_cap_and_empty(spark):
    vecs = _outlier_clusters(seed=3, n_anchors=4, n=120)
    df = spark.createDataFrame(vecs, "vec_id long, v array<double>")
    _, cells = build_bench_cells(vecs, k=4)
    cents = [(cid, cv) for cid, cv, _ in cells]
    assert (
        drain_saturated_cells(
            df, "vec_id", "v", cents, threshold=0.9, cand_cap=10**9
        )
        == cents
    )
    assert (
        drain_saturated_cells(
            df, "vec_id", "v", [], threshold=0.9, cand_cap=1
        )
        == []
    )


def test_candidate_loads_arithmetic():
    """load(c) = n_c * sum over compatible partners — checked by hand
    on a 3-cell line where only adjacent cells are compatible."""
    cells = [
        (1, [1.0, 0.0], 0.2),
        (2, [0.0, 1.0], 0.2),
        (3, [-1.0, 0.0], 0.2),
    ]
    # th=0.4 -> r=sqrt(1.2)~1.095; d(1,2)=sqrt(2)~1.414 <=
    # 0.2+1.095+0.2 compatible, d(1,3)=2 > 1.495 incompatible
    counts = {1: 10, 2: 20, 3: 30}
    loads = cell_candidate_loads(counts, cells, 0.4)
    assert loads == {
        1: 10 * (10 + 20),
        2: 20 * (10 + 20 + 30),
        3: 30 * (20 + 30),
    }


def test_registered_drained_twin_equals_undrained(spark):
    from go_nonrat_annotation_pipeline_spark.plans.queries_dedup_exact_cells import (
        dedup_embedding_exact_pairs,
    )
    from go_nonrat_annotation_pipeline_spark.plans.queries_dedup_exact_cells2 import (
        dedup_embedding_exact_pairs_drained,
    )

    base = {
        (r.vec_id_a, r.vec_id_b, r.cosine)
        for r in dedup_embedding_exact_pairs(spark, SF).collect()
    }
    drained = {
        (r.vec_id_a, r.vec_id_b, r.cosine)
        for r in dedup_embedding_exact_pairs_drained(spark, SF).collect()
    }
    assert drained == base and base
