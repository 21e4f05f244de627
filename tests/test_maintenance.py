"""Small-file compaction + schema-evolution reads (sources/maintenance)."""

from __future__ import annotations

from pyspark.sql import functions as F

from go_nonrat_annotation_pipeline_spark.sources.maintenance import (
    compact_parquet,
    parquet_file_count,
    read_with_evolved_schema,
)


def test_compaction_preserves_rows_and_reduces_files(spark, tmp_path):
    path = str(tmp_path / "frag")
    # 64 tiny files
    spark.range(10_000).repartition(64).write.parquet(path)
    assert parquet_file_count(path) == 64
    before = set(r.id for r in spark.read.parquet(path).collect())

    n = compact_parquet(spark, path, target_file_bytes=64 * 1024 * 1024)
    assert n < 8
    after = set(r.id for r in spark.read.parquet(path).collect())
    assert after == before


def test_compaction_keeps_hive_partitions(spark, tmp_path):
    path = str(tmp_path / "part")
    df = spark.range(3_000).select(
        "id", (F.col("id") % 3).alias("species_type_key")
    )
    df.repartition(40).write.partitionBy("species_type_key").parquet(path)
    assert parquet_file_count(path) > 40
    compact_parquet(
        spark, path, target_file_bytes=64 * 1024 * 1024,
        partition_col="species_type_key",
    )
    back = spark.read.parquet(path)
    assert back.count() == 3_000
    # layout still partition-pruned
    pruned = back.where("species_type_key = 1")
    p = spark._jvm.PythonSQLUtils.explainString(
        pruned._jdf.queryExecution(), "formatted"
    )
    assert "PartitionFilters: [isnotnull(species_type_key" in p


def test_schema_evolution_read(spark, tmp_path):
    path = str(tmp_path / "evolve")
    spark.createDataFrame([(1, "a")], "id long, x string").write.mode(
        "append"
    ).parquet(path)
    spark.createDataFrame(
        [(2, "b", 9.5)], "id long, x string, score double"
    ).write.mode("append").parquet(path)
    out = read_with_evolved_schema(spark, path)
    rows = {r.id: (r.x, r.score) for r in out.collect()}
    assert rows == {1: ("a", None), 2: ("b", 9.5)}


def test_summarize_table_one_pass(spark):
    from go_nonrat_annotation_pipeline_spark.sources.maintenance import (
        summarize_table,
    )

    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "a"), (4, "b")], "id long, x string"
    )
    stats = {r.column: r for r in summarize_table(df).collect()}
    assert stats["id"].n_rows == 4 and stats["id"].n_nulls == 0
    assert stats["x"].n_nulls == 1
    assert stats["x"].approx_ndv == 2  # exact at this cardinality
