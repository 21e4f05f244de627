"""Loaders for the driver-provided synthetic parquet tables (TESTDATA.md).

Read-only inputs at /root/testdata/sf{0.001,0.01,0.1}/<table>.parquet.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..schemas import TESTDATA_TABLES

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def parquet_ts_unit(path: str, col: str = "ts") -> str | None:
    """Physical timestamp unit ('ns', 'us', 'ms', ...) of a parquet
    column, read from the footer with pyarrow — no Spark session conf
    involved, so callers can decide whether the nanosAsLong workaround
    is needed BEFORE touching session state. Returns None when the
    column is absent, not a timestamp, or the footer is unreadable
    (corrupt/non-parquet file) — callers then proceed without the nanos
    workaround and Spark's own reader surfaces the real error.

    Directory layouts are probed via the FIRST part file only (single-
    footer assumption, same as streaming/stream.read_events_stream): the
    driver's datasets are single-writer and unit-homogeneous. A mixed-
    unit directory (first part micros, later parts nanos) would skip the
    nanosAsLong conf and fail in the scan — re-encode such data rather
    than mixing units within one dataset.
    """
    import pyarrow as pa
    import pyarrow.parquet as pq

    p = path
    if os.path.isdir(p):
        parts = sorted(f for f in os.listdir(p) if f.endswith(".parquet"))
        if not parts:
            return None
        p = os.path.join(p, parts[0])
    try:
        t = pq.read_schema(p).field(col).type
    except (KeyError, OSError, ValueError, pa.ArrowInvalid):
        # ArrowInvalid: corrupt/truncated footer or not a parquet file
        return None
    return getattr(t, "unit", None)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        # events.parquet ts has shipped as either TIMESTAMP(NANOS) (which
        # Spark's parquet reader rejects without nanosAsLong) or native
        # TIMESTAMP(MICROS); adapt to whichever this dataset has. The
        # legacy conf is session-global and must stay set through job
        # EXECUTION (the scan re-reads it task-side), so set it only when
        # the footer actually says nanos — a micros dataset leaves session
        # state untouched and other TIMESTAMP(NANOS) columns unaffected.
        if parquet_ts_unit(path) == "ns":
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        t = df.schema["ts"].dataType
        if isinstance(t, T.LongType):
            # integer div, NOT /1000: double division rounds the µs at ~1e15
            # magnitudes (ulp 0.25) — off-by-one µs vs DuckDB's truncation
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif isinstance(t, T.TimestampNTZType):
            # session tz is UTC, so NTZ→LTZ is value-preserving and keeps
            # downstream window/watermark code on one timestamp type
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        return df
    return spark.read.parquet(path)


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TESTDATA_TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view for spark.sql queries."""
    for t in TESTDATA_TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
