"""Loaders for the driver-provided synthetic parquet tables (TESTDATA.md).

Read-only inputs at /root/testdata/sf{0.001,0.01,0.1}/<table>.parquet.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from pyspark.sql import functions as F

from ..schemas import TESTDATA_TABLES

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        # events.parquet stores ts as TIMESTAMP(NANOS), which Spark's parquet
        # reader rejects; read nanos as long and convert to a µs timestamp
        # (matching DuckDB's nanos→µs truncation on the oracle side).
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        # integer div, NOT /1000: double division rounds the µs at ~1e15
        # magnitudes (ulp 0.25) — off-by-one µs vs DuckDB's truncation
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return spark.read.parquet(path)


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TESTDATA_TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view for spark.sql queries."""
    for t in TESTDATA_TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
