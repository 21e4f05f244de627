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


def test_refresh_partitions_touches_only_incoming(spark, tmp_path):
    from go_nonrat_annotation_pipeline_spark.sources.maintenance import (
        refresh_partitions,
    )

    path = str(tmp_path / "parts")
    base = spark.createDataFrame(
        [(1, "a", 10), (2, "a", 20), (3, "b", 30), (4, "c", 40)],
        "id long, part string, v long",
    )
    base.write.partitionBy("part").parquet(path)
    import glob
    import os

    def files_in(p):
        return sorted(
            os.path.basename(f)
            for f in glob.glob(os.path.join(path, f"part={p}", "*.parquet"))
        )

    before_b = files_in("b")
    before_c = files_in("c")
    # refresh carries ONLY partition a (changed rows) — b and c must
    # keep their exact files; a is replaced wholesale
    delta = spark.createDataFrame(
        [(1, "a", 11), (5, "a", 50)], "id long, part string, v long"
    )
    refresh_partitions(delta, path, "part")
    assert files_in("b") == before_b
    assert files_in("c") == before_c
    got = sorted(
        tuple(r) for r in spark.read.parquet(path).select("id", "part", "v").collect()
    )
    assert got == [(1, "a", 11), (3, "b", 30), (4, "c", 40), (5, "a", 50)]


def test_refresh_partitions_static_mode_would_truncate(spark, tmp_path):
    # the guard rail this function exists for: a plain overwrite drops
    # the untouched partitions
    path = str(tmp_path / "parts2")
    base = spark.createDataFrame(
        [(1, "a", 10), (3, "b", 30)], "id long, part string, v long"
    )
    base.write.partitionBy("part").parquet(path)
    delta = spark.createDataFrame(
        [(5, "a", 50)], "id long, part string, v long"
    )
    delta.write.mode("overwrite").option(
        "partitionOverwriteMode", "static"
    ).partitionBy("part").parquet(path)
    left = {r.part for r in spark.read.parquet(path).collect()}
    assert left == {"a"}  # b is gone — exactly why dynamic mode matters


def test_erasure_rewrite_touches_only_affected_partitions(spark, tmp_path):
    """RTBF composition: anti-join out the erased keys, rewrite ONLY
    the partitions that carried them (dynamic overwrite) — weeks with
    no erased rows keep their exact files."""
    import glob
    import os

    from pyspark.sql import functions as F

    from go_nonrat_annotation_pipeline_spark.sources.maintenance import (
        refresh_partitions,
    )

    path = str(tmp_path / "ev")
    rows = [
        # (id, user, week): user 37 appears only in weeks 1 and 3
        (1, 37, 1), (2, 5, 1), (3, 6, 2), (4, 7, 2),
        (5, 37, 3), (6, 8, 3), (7, 9, 4),
    ]
    base = spark.createDataFrame(rows, "id long, user long, week long")
    base.write.partitionBy("week").parquet(path)

    def files_in(w):
        return sorted(
            os.path.basename(f)
            for f in glob.glob(os.path.join(path, f"week={w}", "*.parquet"))
        )

    before = {w: files_in(w) for w in (1, 2, 3, 4)}
    stored = spark.read.parquet(path)
    erase = spark.createDataFrame([(37,)], "user long")
    affected = (
        stored.join(F.broadcast(erase), "user")
        .select("week")
        .distinct()
    )
    survivors = (
        stored.join(F.broadcast(affected), "week")  # affected parts only
        .join(F.broadcast(erase), "user", "left_anti")
    )
    refresh_partitions(survivors, path, "week")

    assert files_in(2) == before[2] and files_in(4) == before[4]
    got = sorted(
        (r.id, r.user, r.week)
        for r in spark.read.parquet(path).collect()
    )
    assert got == [(2, 5, 1), (3, 6, 2), (4, 7, 2), (6, 8, 3), (7, 9, 4)]
