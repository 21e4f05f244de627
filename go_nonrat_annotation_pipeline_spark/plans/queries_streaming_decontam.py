"""Streaming decontamination gate — round-9 trailing module,
registered AFTER WINDOW_R9; round-10 rotation fill.

The stream twin of q_decontam_verdicts: documents arrive in
micro-batches (the ingest lane of a training-data pipeline); each
batch's docs are probed against the STATIC benchmark gram set —
computed once, pinned, broadcast into every trigger — and contaminated
docs append to a durable quarantine side store (set union, batching-
independent, so no mtime pinning needed). After the drain the
quarantine holds exactly the batch gate's verdicts over the whole
corpus — the oracle. This is decontamination as it runs in production:
a per-trigger gate at ingest, not a post-hoc corpus scan.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import functions as F

from ..operators import decontam as DC
from ..sources.testdata import load_table
from .registry import register

_N = 8
_BENCH = "doc_id % 29 = 0"
_CORPUS = "doc_id % 29 != 0"

_CTES = DC.sql_decontam_ctes(
    f"(SELECT doc_id, text FROM documents WHERE {_CORPUS})",
    f"(SELECT doc_id, text FROM documents WHERE {_BENCH})",
    _N,
)


@register(
    "stream_decontam_gate",
    "    WITH " + _CTES + """
    SELECT doc_id, n_grams, n_hits
    FROM dc_verdicts WHERE contaminated
    """,
    doc="streaming decontamination gate: per micro-batch n-gram probe "
    "of incoming docs against the pinned broadcast benchmark gram set; "
    "contaminated docs append to a quarantine side store whose drained "
    "contents hash-equal the batch gate over the whole corpus",
)
def stream_decontam_gate(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    bench = docs.where(_BENCH)
    # the benchmark gram set: computed ONCE, pinned, broadcast per batch
    bg = (
        DC.benchmark_grams(bench, n=_N)
        .withColumn("_m", F.lit(1).cast("long"))
        .localCheckpoint()
    )
    state = {
        "q": spark.createDataFrame(
            [], "doc_id long, n_grams long, n_hits long"
        ).localCheckpoint()
    }

    def handle(batch_df, batch_id):
        if batch_df.isEmpty():
            return
        occ = DC._doc_grams(batch_df, "doc_id", "text", _N)
        dirty = (
            occ.join(F.broadcast(bg), "shash", "left")
            .groupBy("_id")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_grams"),
                F.coalesce(F.sum("_m"), F.lit(0)).cast("long").alias("n_hits"),
            )
            .where(F.col("n_hits") >= 1)
            .select(F.col("_id").alias("doc_id"), "n_grams", "n_hits")
        )
        state["q"] = state["q"].unionByName(dirty).localCheckpoint()

    root = tempfile.mkdtemp(prefix="stream_decontam_")
    try:
        staged = os.path.join(root, "docs")
        os.makedirs(staged)
        base = 1_600_000_000
        for i in range(3):
            tmp = os.path.join(root, f"tmp_{i}")
            docs.where(_CORPUS).where(f"doc_id % 3 = {i}").select(
                "doc_id", "text"
            ).coalesce(1).write.mode("overwrite").parquet(tmp)
            part = next(
                p for p in os.listdir(tmp) if p.endswith(".parquet")
            )
            dst = os.path.join(staged, f"b{i}.parquet")
            shutil.move(os.path.join(tmp, part), dst)
            os.utime(dst, (base + i, base + i))
            shutil.rmtree(tmp)
        stream = (
            spark.readStream.schema("doc_id long, text string")
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
