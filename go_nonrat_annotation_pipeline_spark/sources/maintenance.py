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


def summarize_table(df: DataFrame) -> DataFrame:
    """ANALYZE-lite: one pass over the table producing per-column
    (nulls, approx_ndv) plus total rows — the statistics a planner (or a
    human sizing a join strategy) needs. Single aggregate, no shuffle
    beyond the final 1-row reduce; HLL-based ndv so a 100 TB table costs
    one scan.
    """
    from pyspark.sql import functions as F

    aggs = [F.count(F.lit(1)).alias("_rows")]
    for c in df.columns:
        aggs.append(F.sum(F.col(c).isNull().cast("long")).alias(f"_n_{c}"))
        aggs.append(F.approx_count_distinct(c).alias(f"_d_{c}"))
    row = df.agg(*aggs).collect()[0]
    spark = df.sparkSession
    out = [
        (c, int(row["_rows"]), int(row[f"_n_{c}"]), int(row[f"_d_{c}"]))
        for c in df.columns
    ]
    return spark.createDataFrame(
        out, "column string, n_rows long, n_nulls long, approx_ndv long"
    )


def refresh_partitions(
    df_new: DataFrame,
    path: str,
    part_col: str,
) -> None:
    """Overwrite ONLY the partitions present in ``df_new`` (dynamic
    partition overwrite) — the day-2 refresh primitive for a
    partitioned 100 TB table: a daily delta touching 3 of 3,000
    date partitions rewrites 3 directories, never the table.

    Static overwrite (`mode=overwrite` + partitionBy, the default
    `partitionOverwriteMode=STATIC`) would TRUNCATE the whole table
    first; the dynamic conf scopes the overwrite to partitions the
    incoming frame actually carries. Set per-write via the DataFrame
    option so the session conf stays untouched (the driver owns the
    session — same rule as load_table's nanos conf)."""
    (
        df_new.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(part_col)
        .parquet(path)
    )
