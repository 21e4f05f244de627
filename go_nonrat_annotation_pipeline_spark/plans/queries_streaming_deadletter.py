"""Streaming dead-letter quarantine — round-7 trailing module,
registered AFTER WINDOW_R7.

The stream twin of q_json_quarantine_rows: each micro-batch parse-or-
null routes its rows, quarantined rows append to a durable side store
(set union — order-independent, so no mtime pinning needed), good rows
would flow on to the aggregate sink. After the drain the quarantine
store holds exactly the rows the batch router flags over the whole
log — the oracle. This is the dead-letter lane as it actually runs in
production: per-trigger routing with a replayable quarantine table,
not a post-hoc scan.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import functions as F

from ..sources.testdata import load_table
from .registry import register

_CORRUPT = "event_id % 7 = 0"


@register(
    "stream_json_quarantine",
    f"""
    WITH c AS (
      SELECT event_id, event_type,
             CASE WHEN {_CORRUPT} THEN '{{' || props ELSE props END
               AS props
      FROM events
    )
    SELECT event_id, event_type FROM c
    WHERE NOT json_valid(props)
       OR (CASE WHEN json_valid(props)
                THEN CAST(props->>'k' AS BIGINT) END) IS NULL
    """,
    doc="streaming dead-letter lane: per micro-batch parse-or-null "
    "routing appends quarantined rows to a side store (set union — "
    "batching-independent); the drained store hash-equals the batch "
    "router's quarantine set over the whole log",
)
def stream_json_quarantine(spark, sf_dir):
    events = load_table(spark, sf_dir, "events")
    state = {
        "q": spark.createDataFrame(
            [], "event_id long, event_type string"
        ).localCheckpoint()
    }

    def handle(batch_df, batch_id):
        if batch_df.isEmpty():
            return
        inj = batch_df.select(
            "event_id",
            "event_type",
            F.when(
                F.expr(_CORRUPT), F.concat(F.lit("{"), F.col("props"))
            )
            .otherwise(F.col("props"))
            .alias("props"),
        )
        dead = inj.where(
            F.get_json_object("props", "$.k").cast("long").isNull()
        ).select("event_id", "event_type")
        state["q"] = (
            state["q"].unionByName(dead).localCheckpoint()
        )

    root = tempfile.mkdtemp(prefix="stream_dlq_")
    try:
        staged = os.path.join(root, "ev")
        os.makedirs(staged)
        base = 1_600_000_000
        for i in range(3):
            tmp = os.path.join(root, f"tmp_{i}")
            events.where(f"event_id % 3 = {i}").select(
                "event_id", "event_type", "props"
            ).coalesce(1).write.mode("overwrite").parquet(tmp)
            part = next(
                p for p in os.listdir(tmp) if p.endswith(".parquet")
            )
            dst = os.path.join(staged, f"b{i}.parquet")
            shutil.move(os.path.join(tmp, part), dst)
            os.utime(dst, (base + i, base + i))
            shutil.rmtree(tmp)
        stream = (
            spark.readStream.schema(
                "event_id long, event_type string, props string"
            )
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
