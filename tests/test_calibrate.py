from __future__ import annotations

from pyspark.sql import functions as F

from go_nonrat_annotation_pipeline_spark.operators import calibrate as CB

SF = "/root/testdata/sf0.001"


def _docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


def test_percentile_bounds_and_monotonicity(spark):
    p = CB.rank_percentile_by_group(_docs(spark)).cache()
    assert p.where((F.col("pct_ppm") < 0) | (F.col("pct_ppm") > CB.PPM)).count() == 0
    # min and max of every group hit the ends exactly
    ends = p.groupBy("source").agg(
        F.min("pct_ppm").alias("lo"), F.max("pct_ppm").alias("hi")
    )
    assert ends.where((F.col("lo") != 0) | (F.col("hi") != CB.PPM)).count() == 0
    # percentile is monotone in score within a group
    rows = p.orderBy("source", "pct_ppm").collect()
    prev = {}
    for r in rows:
        if r.source in prev:
            assert r.score_ppm >= prev[r.source]
        prev[r.source] = r.score_ppm


def test_calibration_beats_global_threshold(spark):
    # Two synthetic sources with disjoint score ranges: a global top-25%
    # cut takes everything from the clean source and nothing from the
    # noisy one; the calibrated cut takes 25% of EACH.
    clean = [(i, "rep " * 2 + " ".join(f"w{i}_{j}" for j in range(8)), "clean")
             for i in range(40)]
    noisy = [(100 + i, "dup dup dup dup " + f"w{i}", "noisy")
             for i in range(40)]
    docs = spark.createDataFrame(
        clean + noisy, "doc_id long, text string, source string"
    )
    sel = CB.top_fraction_per_group(docs, 250_000)
    per_src = {r.source: r.cnt for r in
               sel.groupBy("source").agg(F.count("*").alias("cnt")).collect()}
    assert per_src.get("clean", 0) > 0 and per_src.get("noisy", 0) > 0
    # roughly a quarter each (rank percentile is exact, ties may round)
    assert per_src["clean"] <= 40 * 0.35 and per_src["noisy"] <= 40 * 0.35


def test_curriculum_layout_shape(spark):
    lay = CB.curriculum_layout(_docs(spark)).cache()
    # every doc placed once
    assert lay.count() == lay.select("doc_id").distinct().count()
    assert lay.where((F.col("bucket") < 0) | (F.col("bucket") > 9)).count() == 0
    # positions are dense 1..n within (bucket, shard)
    chk = lay.groupBy("bucket", "shard").agg(
        F.count("*").alias("n"), F.max("pos").alias("mx"), F.min("pos").alias("mn")
    )
    assert chk.where((F.col("mx") != F.col("n")) | (F.col("mn") != 1)).count() == 0
