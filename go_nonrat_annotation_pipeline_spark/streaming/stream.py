"""Structured Streaming operators.

The reference pipeline is strictly batch (SURVEY.md §2.5); streaming is
the engine's extension surface: the incremental-upsert dataflow maps
naturally onto readStream → transform → foreachBatch(merge). Provided
here: a parquet-source event stream with the nanos workaround, a
tumbling-window aggregation, and a synchronous drain helper for tests
and the oracle harness.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENTS_STREAM_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.LongType()),  # TIMESTAMP(NANOS) read as long
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def read_events_stream(spark: SparkSession, path: str) -> DataFrame:
    """Streaming scan of the events parquet with ns→µs ts conversion.

    FileStreamSource needs a directory; `path` may be a single file, so
    stream its parent dir with a pathGlobFilter pinning the file name.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    import os

    if path.endswith(".parquet"):
        base, fname = os.path.dirname(path), os.path.basename(path)
    else:
        base, fname = path, "*.parquet"
    src = (
        spark.readStream.schema(EVENTS_STREAM_SCHEMA)
        .option("pathGlobFilter", fname)
        .parquet(base)
    )
    return src.withColumn(
        "ts", F.timestamp_micros((F.col("ts") / 1000).cast("long"))
    )


def tumbling_counts(
    events: DataFrame, window: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Windowed counts + decimal-exact value sums with a watermark for
    late data (append-mode capable on a live source)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,6)"))
            .cast("decimal(38,6)")
            .alias("total_value"),
        )
    )


def run_to_memory(agg: DataFrame, mode: str = "complete") -> DataFrame:
    """Drain a (bounded) streaming query synchronously into a memory sink
    and return the result as a batch DataFrame."""
    name = f"stream_out_{uuid.uuid4().hex[:8]}"
    q = (
        agg.writeStream.outputMode(mode)
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    spark = agg.sparkSession
    return spark.table(name)
