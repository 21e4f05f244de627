from __future__ import annotations

from pyspark.sql import functions as F

from go_nonrat_annotation_pipeline_spark.operators import mixture as MX

SF = "/root/testdata/sf0.001"


def _docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


def test_rates_temperature_flattens(spark):
    # Build a skewed corpus: one giant source, one tiny one.
    docs = spark.range(1100).selectExpr(
        "id AS doc_id",
        "CASE WHEN id < 1000 THEN 'big' ELSE 'small' END AS source",
    )
    rates = {r.source: r for r in MX.temperature_rates(docs).collect()}
    # sqrt flattening: small's mixture share (per doc) exceeds big's
    small_per_doc = rates["small"].p_ppm / rates["small"].n_docs
    big_per_doc = rates["big"].p_ppm / rates["big"].n_docs
    assert small_per_doc > 2 * big_per_doc
    # and so does the realized keep rate
    assert rates["small"].keep_ppm > rates["big"].keep_ppm
    # gates are valid ppm values
    for r in rates.values():
        assert 0 <= r.keep_ppm <= MX.PPM


def test_keep_ppm_clamps_at_full_keep(spark):
    # With a huge target the tail source's implied rate exceeds 1x and
    # must clamp to exactly PPM (no up-sampling without replacement).
    docs = spark.range(1100).selectExpr(
        "id AS doc_id",
        "CASE WHEN id < 1000 THEN 'big' ELSE 'small' END AS source",
    )
    rates = {
        r.source: r
        for r in MX.temperature_rates(docs, target_ppm=MX.PPM).collect()
    }
    assert rates["small"].keep_ppm == MX.PPM


def test_sample_is_deterministic_and_near_target(spark):
    docs = _docs(spark)
    a = MX.temperature_sample(docs, salt="mix0")
    b = MX.temperature_sample(docs, salt="mix0")
    assert sorted(r.doc_id for r in a.collect()) == sorted(
        r.doc_id for r in b.collect()
    )
    n = docs.count()
    got = a.count()
    # target is half the corpus; the hash gate binomial noise at n=500
    # stays well within +/-15 points
    assert 0.35 * n < got < 0.65 * n
    # a different salt draws a different sample of similar size
    c = MX.temperature_sample(docs, salt="mix1")
    assert sorted(r.doc_id for r in c.collect()) != sorted(
        r.doc_id for r in a.collect()
    )


def test_sample_is_subset_with_source_kept(spark):
    docs = _docs(spark)
    s = MX.temperature_sample(docs)
    joined = s.join(
        docs.select("doc_id", F.col("source").alias("src0")), "doc_id"
    )
    assert joined.where(F.col("source") != F.col("src0")).count() == 0
    assert s.count() == s.select("doc_id").distinct().count()
