"""Table-maintenance utilities: small-file compaction and schema-
evolution reads — the operational half of running a parquet lake at
100 TB (no Delta in this container; the swap-directory commit mirrors
pipeline/sink.AnnotStore._swap_in).

Small files are the classic large-cluster failure mode: a 100 TB table
written by 10k tasks per run accretes millions of KB-sized files, and
every downstream scan pays file-open + footer-read per file. Compaction
rewrites each partition to ~target-sized files; size-based (not
count-based) so skewed hive partitions get proportionally more files.
"""

from __future__ import annotations

import math
import os
import shutil

from pyspark.sql import DataFrame, SparkSession


def dir_bytes(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        total += sum(os.path.getsize(os.path.join(root, f)) for f in files)
    return total


def parquet_file_count(path: str) -> int:
    n = 0
    for _root, _dirs, files in os.walk(path):
        n += sum(1 for f in files if f.endswith(".parquet"))
    return n


def compact_parquet(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 256 * 1024 * 1024,
    partition_col: str | None = None,
) -> int:
    """Rewrite a parquet directory into ceil(bytes/target) files and
    atomically swap it in. Returns the new file count.

    With ``partition_col`` the layout stays hive-partitioned and each
    output task writes one partition's rows (repartition on the
    partition column — skewed partitions still split across files via
    maxRecordsPerFile-free size estimate; for the bench-scale store a
    per-partition single file is the right shape).
    """
    size = dir_bytes(path)
    n_files = max(1, math.ceil(size / target_file_bytes))
    df: DataFrame = spark.read.parquet(path)
    tmp = path + ".compact_tmp"
    if partition_col is None:
        df.repartition(n_files).write.mode("overwrite").parquet(tmp)
    else:
        (
            df.repartition(n_files, partition_col)
            .write.mode("overwrite")
            .partitionBy(partition_col)
            .parquet(tmp)
        )
    shutil.rmtree(path)
    os.rename(tmp, path)
    return parquet_file_count(path)


def read_with_evolved_schema(spark: SparkSession, path: str) -> DataFrame:
    """Schema-evolution read: union the footers of every file so rows
    written before a column existed surface it as NULL (mergeSchema —
    footer union only, no data rewrite)."""
    return spark.read.option("mergeSchema", "true").parquet(path)
