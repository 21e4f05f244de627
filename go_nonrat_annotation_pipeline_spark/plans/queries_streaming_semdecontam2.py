"""Streaming exact-ANN decontamination gate — round-12 module,
registered AFTER WINDOW_R12 (leads round 13).

Completes the gate matrix's last cell: the batch ANN gate
(``q_semantic_decontam_ann``) has a brute-force stream twin
(``stream_semantic_decontam_gate``, frozen) that crossJoins every
micro-batch against the ENTIRE broadcast bench — per-trigger cost
B cosines per item. Here the bench is compiled ONCE before the stream
into lossless ball-pruned cells (capped-sample train, map-side bench
assignment, distributive full-population residual re-aggregation —
the round-12 sampling discipline), and each trigger probes only the
cells passing the bound: per-item cost k folded-in centroid dots plus
candidates in probed cells, with flagged items provably carrying the
same (bench_id, cosine) argmax as brute force (the pruned search sees
every within-threshold pair). Quarantine state is a set union —
batching- and order-insensitive — so the drained store hash-equals
the batch gate over the whole corpus, and the oracle is the SAME
flagged-rows SQL as the brute-force stream twin.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import functions as F

from ..operators.decontam_ann import (
    build_bench_cells,
    probe_cells,
    residual_to_cell,
    train_sample,
)
from ..operators.dedup import cosine
from ..operators.similarity import _as_double, argmax_cell
from ..sources.testdata import load_table
from .registry import register
from .queries_semantic_decontam import _CTES, _TH_6DP

_K_CELLS = 8
_TRAIN_TARGET = 2000


@register(
    "stream_semantic_decontam_gate_ann",
    "    WITH "
    + _CTES
    + f"""
    SELECT vec_id, bench_id, cosine
    FROM sdq_best WHERE cosine >= {_TH_6DP}
    """,
    doc="streaming exact-ANN decontamination: bench compiled once into "
    "lossless ball-pruned cells (capped-sample train, distributive "
    "residual re-agg), each micro-batch probes only bound-passing "
    "cells (k map-side dots/item + candidates) instead of the full "
    "broadcast bench; the drained quarantine hash-equals the batch "
    "brute-force gate over the whole corpus",
)
def stream_semantic_decontam_gate_ann(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    bench = (
        emb.where("label = 0")
        .select(
            F.col("vec_id").alias("bench_id"),
            _as_double(F.col("embedding")).alias("vb"),
        )
        .localCheckpoint()
    )
    sample_rows = train_sample(
        bench, "bench_id", "vb", target=_TRAIN_TARGET
    )
    _, cells = build_bench_cells(sample_rows, k=_K_CELLS)
    empty = spark.createDataFrame(
        [], "vec_id long, bench_id long, cosine double"
    )
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
    maxres = {
        r[0]: r[1]
        for r in bench_cells.groupBy("cell")
        .agg(F.max("res").alias("res"))
        .collect()
    }
    full_cells = [
        (cid, cv, float(maxres.get(cid, 0.0))) for cid, cv in cent_rows
    ]
    bcells = bench_cells.select("cell", "bench_id", "vb")
    state = {"q": empty.localCheckpoint()}

    def handle(batch_df, batch_id):
        if batch_df.isEmpty():
            return
        # flagged-only output: explode (not explode_outer) — an item
        # probing zero cells is provably clean and never joins
        dirty = (
            batch_df.select(
                "vec_id", _as_double(F.col("embedding")).alias("vc")
            )
            .select(
                "vec_id",
                "vc",
                F.explode(
                    probe_cells(F.col("vc"), full_cells, _TH_6DP)
                ).alias("cell"),
            )
            .join(F.broadcast(bcells), "cell")
            .withColumn(
                "cosine", F.round(cosine(F.col("vc"), F.col("vb")), 6)
            )
            .groupBy("vec_id")
            .agg(
                F.max(
                    F.struct(
                        F.col("cosine"), (-F.col("bench_id")).alias("nbid")
                    )
                ).alias("_b")
            )
            .where(F.col("_b.cosine") >= F.lit(_TH_6DP))
            .select(
                "vec_id",
                (-F.col("_b.nbid")).cast("long").alias("bench_id"),
                F.col("_b.cosine").alias("cosine"),
            )
        )
        state["q"] = state["q"].unionByName(dirty).localCheckpoint()

    root = tempfile.mkdtemp(prefix="stream_semdecontam_ann_")
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
