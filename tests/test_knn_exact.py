"""Exact top-k cosine join (operators/knn_exact): agreement with numpy
brute force on clustered AND unclustered data, real pruning on the
clustered regime, and the seed fold's occupancy guarantee.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Window, functions as F

from go_nonrat_annotation_pipeline_spark.operators.decontam_ann import (
    build_bench_cells,
    residual_to_cell,
)
from go_nonrat_annotation_pipeline_spark.operators.dedup import cosine
from go_nonrat_annotation_pipeline_spark.operators.knn_exact import (
    probe_cells_topk,
    seed_cells,
)
from go_nonrat_annotation_pipeline_spark.operators.similarity import (
    argmax_cell,
)

SF = "/root/testdata/sf0.001"


def _clustered(seed, n_anchors, n_bench, n_corpus, dim=16, spread=0.05):
    rng = np.random.default_rng(seed)
    A = rng.normal(size=(n_anchors, dim))
    A /= np.linalg.norm(A, axis=1, keepdims=True)
    bench = []
    for i in range(n_bench):
        v = A[i % n_anchors] + spread * rng.normal(size=dim)
        bench.append((i, [float(x) for x in v / np.linalg.norm(v)]))
    corpus = []
    for i in range(n_corpus):
        if i % 2 == 0:
            v = A[i % n_anchors] + spread * rng.normal(size=dim)
        else:
            v = rng.normal(size=dim)
        corpus.append((10_000 + i, [float(x) for x in v / np.linalg.norm(v)]))
    return bench, corpus


def _brute_topk(corpus, bench, k):
    B = np.asarray([v for _, v in bench])
    Bh = B / np.linalg.norm(B, axis=1, keepdims=True)
    bids = np.asarray([i for i, _ in bench])
    out = {}
    for cid, cv in corpus:
        x = np.asarray(cv)
        cos = np.round(Bh @ (x / np.linalg.norm(x)), 6)
        order = sorted(
            range(len(bids)), key=lambda j: (-cos[j], bids[j])
        )[:k]
        out[cid] = [(r + 1, int(bids[j]), float(cos[j]))
                    for r, j in enumerate(order)]
    return out


def _run(spark, corpus, bench, k, k_cells):
    _, cells = build_bench_cells(bench, k=k_cells)
    cent_rows = [(cid, cv) for cid, cv, _ in cells]
    bdf = spark.createDataFrame(
        [(i, v) for i, v in bench], "bench_id long, vb array<double>"
    ).withColumn("cell", argmax_cell(F.col("vb"), cent_rows)).withColumn(
        "res", residual_to_cell(F.col("vb"), F.col("cell"), cent_rows)
    )
    stats = {
        r[0]: (float(r[1]), int(r[2]))
        for r in bdf.groupBy("cell")
        .agg(F.max("res").alias("res"), F.count(F.lit(1)).alias("n"))
        .collect()
    }
    full = [(c, cv, stats.get(c, (0.0, 0))[0]) for c, cv in cent_rows]
    occ = {c: stats.get(c, (0.0, 0))[1] for c, _ in cent_rows}
    bcells = bdf.select("cell", "bench_id", "vb")
    cdf = spark.createDataFrame(
        corpus, "vec_id long, vc array<double>"
    )
    seeded = (
        cdf.select(
            "vec_id", "vc",
            F.explode(seed_cells(F.col("vc"), full, occ, k)).alias("cell"),
        )
        .join(F.broadcast(bcells), "cell")
        .withColumn("cosine", F.round(cosine(F.col("vc"), F.col("vb")), 6))
        .groupBy("vec_id")
        .agg(
            F.first("vc").alias("vc"),
            F.sort_array(F.collect_list("cosine")).alias("cs"),
        )
        .withColumn(
            "tx",
            F.when(
                F.size("cs") >= k,
                F.element_at(F.col("cs"), F.size("cs") - k + 1),
            ).otherwise(F.lit(-1.0)),
        )
        .drop("cs")
    )
    cand = (
        seeded.select(
            "vec_id", "vc", "tx",
            F.explode(
                probe_cells_topk(F.col("vc"), F.col("tx"), full)
            ).alias("cell"),
        )
        .join(F.broadcast(bcells), "cell")
        .withColumn("cosine", F.round(cosine(F.col("vc"), F.col("vb")), 6))
    )
    n_cand = cand.count()
    w = Window.partitionBy("vec_id").orderBy(
        F.desc("cosine"), F.asc("bench_id")
    )
    rows = (
        cand.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .collect()
    )
    got = {}
    for r in rows:
        got.setdefault(r.vec_id, []).append(
            (r.rank, r.bench_id, r.cosine)
        )
    for v in got.values():
        v.sort()
    return got, n_cand


def test_exact_on_clustered_and_prunes(spark):
    bench, corpus = _clustered(seed=17, n_anchors=16, n_bench=320, n_corpus=120)
    got, n_cand = _run(spark, corpus, bench, k=5, k_cells=16)
    assert got == _brute_topk(corpus, bench, 5)
    # pruning: candidates well under N x B on the clustered bench
    assert n_cand < 0.5 * len(corpus) * len(bench), n_cand


def test_exact_on_unclustered_testdata(spark):
    emb = (
        spark.read.parquet(f"{SF}/embeddings.parquet")
        .select(
            "vec_id",
            F.col("embedding").cast("array<double>").alias("v"),
            "label",
        )
        .collect()
    )
    bench = [(r.vec_id, list(r.v)) for r in emb if r.label == 0]
    corpus = [(r.vec_id, list(r.v)) for r in emb if r.label != 0][:80]
    got, _ = _run(spark, corpus, bench, k=4, k_cells=8)
    assert got == _brute_topk(corpus, bench, 4)


def test_k_exceeds_bench(spark):
    """k > |bench|: every row returns the whole bench, ranked."""
    bench, corpus = _clustered(seed=9, n_anchors=3, n_bench=6, n_corpus=10)
    got, _ = _run(spark, corpus, bench, k=9, k_cells=3)
    want = _brute_topk(corpus, bench, 9)
    assert got == want
    assert all(len(v) == 6 for v in got.values())


def test_seed_occupancy_guarantee(spark):
    """The seed fold always covers >= min(k, |bench|) members."""
    bench, corpus = _clustered(seed=4, n_anchors=8, n_bench=64, n_corpus=20)
    _, cells = build_bench_cells(bench, k=8)
    cent_rows = [(cid, cv) for cid, cv, _ in cells]
    bdf = spark.createDataFrame(
        bench, "bench_id long, vb array<double>"
    ).withColumn("cell", argmax_cell(F.col("vb"), cent_rows))
    occ = {
        r[0]: r[1] for r in bdf.groupBy("cell").count().collect()
    }
    full = [(c, cv, 0.0) for c, cv in cent_rows]
    cdf = spark.createDataFrame(corpus, "vec_id long, vc array<double>")
    for k in (1, 5, 30, 64):
        rows = cdf.select(
            seed_cells(F.col("vc"), full, occ, k).alias("p")
        ).collect()
        for r in rows:
            assert sum(occ.get(c, 0) for c in r.p) >= min(k, len(bench))
