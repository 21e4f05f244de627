"""SparkSession factory.

Tuned defaults for the local[N] test/bench environment while remaining
correct on a real multi-executor cluster: AQE on (runtime coalesce + skew
handling), shuffle partitions sized to cores locally (a cluster deployment
overrides via spark-submit conf), UTC session timezone so timestamp results
are comparable with the DuckDB oracle, and Arrow enabled for the few
pandas-UDF code paths.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "go_nonrat_annotation_pipeline_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Create (or fetch) a SparkSession with engine defaults.

    Env knobs (used by the driver/bench harness):
      SPARK_GRAFT_CPUS  — local parallelism (default: all cores)
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS") or str(os.cpu_count() or 4)
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        # local mode: ~cores, not the 200 default (over-parallelized tiny
        # shuffles dominate wall-clock at test SFs). Cluster submissions
        # override via --conf; AQE coalesces downward at runtime either way.
        shuffle_partitions = int(cpus) if str(cpus).isdigit() else 32

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        # parquet scans: vectorized reader + pushdown are on by default;
        # keep file split size default (128m) — right for 100 TB layouts.
    )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
