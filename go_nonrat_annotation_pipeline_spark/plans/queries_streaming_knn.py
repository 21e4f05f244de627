"""Streaming exact top-k join — round-12 module, registered AFTER
WINDOW_R12 (leads round 13).

Stream twin of ``sim_knn_exact_cells``: corpus embeddings arrive in
micro-batches; the bench is compiled ONCE before the stream into the
lossless cell table (capped-sample train, map-side assignment,
distributive full-population residual re-agg — the round-12
discipline), and each trigger runs the two exact passes (seed lower
bound, cap-bound prune) on JUST the batch. Per-row top-k depends only
on the row and the pinned bench — batching- and order-insensitive —
so the appended result store hash-equals the batch query over the
whole corpus, and the oracle is the SAME brute-force window SQL.
Per-trigger cost: 2k centroid dots per row + candidates; state is the
append-only result store, never the corpus.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import Window, functions as F

from ..operators.decontam_ann import (
    build_bench_cells,
    residual_to_cell,
    train_sample,
)
from ..operators.dedup import cosine
from ..operators.knn_exact import probe_cells_topk, seed_cells
from ..operators.similarity import _as_double, argmax_cell
from ..sources.testdata import load_table
from .registry import register
from .queries_semantic_decontam import _CTES

_K_CELLS = 8
_TRAIN_TARGET = 2000
_TOPK = 5


@register(
    "stream_knn_exact",
    "    WITH "
    + _CTES
    + f"""
    SELECT vec_id, CAST(rn AS BIGINT) AS rank, bench_id, cosine FROM (
      SELECT vec_id, bench_id, cosine,
             ROW_NUMBER() OVER (PARTITION BY vec_id
                                ORDER BY cosine DESC, bench_id ASC) AS rn
      FROM sdq_scored)
    WHERE rn <= {_TOPK}
    """,
    doc="streaming exact top-k join: bench compiled once into lossless "
    "cells, each micro-batch runs the seed + prune passes on its own "
    "rows only; per-row top-k is batch-invariant, so the appended "
    "store hash-equals the batch brute-force window oracle",
)
def stream_knn_exact(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    bench = (
        emb.where("label = 0")
        .select(
            F.col("vec_id").alias("bench_id"),
            _as_double(F.col("embedding")).alias("vb"),
        )
        .localCheckpoint()
    )
    empty = spark.createDataFrame(
        [], "vec_id long, rank long, bench_id long, cosine double"
    )
    sample_rows = train_sample(
        bench, "bench_id", "vb", target=_TRAIN_TARGET
    )
    _, cells = build_bench_cells(sample_rows, k=_K_CELLS)
    if not cells:
        return empty
    cent_rows = [(cid, cv) for cid, cv, _ in cells]
    bench_cells = (
        bench.select(
            "bench_id",
            "vb",
            argmax_cell(F.col("vb"), cent_rows).alias("cell"),
        )
        .withColumn(
            "res",
            residual_to_cell(F.col("vb"), F.col("cell"), cent_rows),
        )
        .localCheckpoint()
    )
    stats = {
        r[0]: (float(r[1]), int(r[2]))
        for r in bench_cells.groupBy("cell")
        .agg(F.max("res").alias("res"), F.count(F.lit(1)).alias("n"))
        .collect()
    }
    full_cells = [
        (cid, cv, stats.get(cid, (0.0, 0))[0]) for cid, cv in cent_rows
    ]
    occupancy = {cid: stats.get(cid, (0.0, 0))[1] for cid, _ in cent_rows}
    bcells = bench_cells.select("cell", "bench_id", "vb")
    w = Window.partitionBy("vec_id").orderBy(
        F.desc("cosine"), F.asc("bench_id")
    )
    state = {"q": empty.localCheckpoint()}

    def handle(batch_df, batch_id):
        if batch_df.isEmpty():
            return
        seeded = (
            batch_df.select(
                "vec_id", _as_double(F.col("embedding")).alias("vc")
            )
            .select(
                "vec_id",
                "vc",
                F.explode(
                    seed_cells(F.col("vc"), full_cells, occupancy, _TOPK)
                ).alias("cell"),
            )
            .join(F.broadcast(bcells), "cell")
            .withColumn(
                "cosine", F.round(cosine(F.col("vc"), F.col("vb")), 6)
            )
            .groupBy("vec_id")
            .agg(
                F.first("vc").alias("vc"),
                F.sort_array(F.collect_list("cosine")).alias("cs"),
            )
            .withColumn(
                "tx",
                F.when(
                    F.size("cs") >= _TOPK,
                    F.element_at(F.col("cs"), F.size("cs") - _TOPK + 1),
                ).otherwise(F.lit(-1.0)),
            )
            .drop("cs")
        )
        topk = (
            seeded.select(
                "vec_id",
                "vc",
                "tx",
                F.explode(
                    probe_cells_topk(F.col("vc"), F.col("tx"), full_cells)
                ).alias("cell"),
            )
            .join(F.broadcast(bcells), "cell")
            .withColumn(
                "cosine", F.round(cosine(F.col("vc"), F.col("vb")), 6)
            )
            .withColumn("rank", F.row_number().over(w).cast("long"))
            .where(F.col("rank") <= _TOPK)
            .select("vec_id", "rank", "bench_id", "cosine")
        )
        state["q"] = state["q"].unionByName(topk).localCheckpoint()

    root = tempfile.mkdtemp(prefix="stream_knn_")
    try:
        staged = os.path.join(root, "emb")
        os.makedirs(staged)
        base = 1_600_000_000
        corpus = emb.where("label != 0").select("vec_id", "embedding")
        for i in range(3):
            tmp = os.path.join(root, f"tmp_{i}")
            corpus.where(f"vec_id % 3 = {i}").coalesce(1).write.mode(
                "overwrite"
            ).parquet(tmp)
            part = next(
                p for p in os.listdir(tmp) if p.endswith(".parquet")
            )
            dst = os.path.join(staged, f"b{i}.parquet")
            shutil.move(os.path.join(tmp, part), dst)
            os.utime(dst, (base + i, base + i))
            shutil.rmtree(tmp)
        stream = (
            spark.readStream.schema("vec_id long, embedding array<float>")
            .option("maxFilesPerTrigger", 1)
            .parquet(staged)
        )
        q = (
            stream.writeStream.outputMode("append")
            .foreachBatch(handle)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        return state["q"]
    finally:
        shutil.rmtree(root, ignore_errors=True)
