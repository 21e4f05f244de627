"""FIM transform (operators/fim.py): reconstruction invariant, rate
gate, determinism, and the ~1/3 middle-mass expectation."""

from __future__ import annotations

from pyspark.sql import functions as F

from go_nonrat_annotation_pipeline_spark.operators import fim as FM


def _docs(spark, n=2000):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("doc "),
            F.col("id").cast("string"),
            F.lit(" body "),
            F.repeat(F.lit("x"), (F.col("id") % 97).cast("int")),
        ).alias("text"),
    )


def test_reconstruction_invariant(spark):
    docs = _docs(spark)
    t = FM.fim_transform(docs)
    bad = (
        t.join(docs, "doc_id")
        .where(
            F.concat("prefix", "middle", "suffix") != F.col("text")
        )
        .count()
    )
    assert bad == 0
    # and lengths always partition the doc
    assert (
        t.join(docs, "doc_id")
        .where(
            F.col("len_prefix") + F.col("len_middle") + F.col("len_suffix")
            != F.length("text")
        )
        .count()
        == 0
    )


def test_custom_text_col_and_null_text(spark):
    """ADVICE r9: the cut draw must honor text_col (it hard-coded
    'text') and coalesce NULL text so the reconstruction invariant
    holds on prefix||middle||suffix == coalesce(body, '')."""
    docs = _docs(spark, 500).select(
        "doc_id",
        F.when(F.col("doc_id") % 7 != 0, F.col("text")).alias("body"),
    )
    t = FM.fim_transform(docs, text_col="body")
    assert t.count() == 500
    joined = t.join(docs, "doc_id")
    assert (
        joined.where(
            F.concat("prefix", "middle", "suffix")
            != F.coalesce(F.col("body"), F.lit(""))
        ).count()
        == 0
    )
    # NULL bodies: all three spans are empty strings, lengths are 0 —
    # never NULL (the invariant the sibling operators keep)
    nulls = joined.where(F.col("body").isNull())
    assert nulls.count() > 0
    assert (
        nulls.where(
            "len_prefix != 0 OR len_middle != 0 OR len_suffix != 0"
            " OR prefix IS NULL OR middle IS NULL OR suffix IS NULL"
        ).count()
        == 0
    )
    # and the renamed column actually drives the cut: same ids with a
    # DIFFERENT body length must cut at different points for applied
    # docs (catches a silent fall-back to a literal 'text' column)
    docs2 = docs.withColumn("body", F.concat(F.coalesce("body", F.lit("")), F.lit("xyz")))
    t2 = FM.fim_transform(docs2, text_col="body")
    diff = (
        t.where("fim_applied").select("doc_id", "len_prefix")
        .join(
            t2.where("fim_applied").select(
                "doc_id", F.col("len_prefix").alias("lp2")
            ),
            "doc_id",
        )
        .where("len_prefix != lp2")
        .count()
    )
    assert diff > 0


def test_untransformed_docs_keep_whole_text_as_prefix(spark):
    t = FM.fim_transform(_docs(spark)).where(~F.col("fim_applied"))
    assert t.count() > 0
    assert t.where("len_middle != 0 OR len_suffix != 0").count() == 0


def test_rate_gate_and_determinism(spark):
    docs = _docs(spark, 5000)
    t = FM.fim_transform(docs, rate_ppm=300_000)
    n = t.count()
    applied = t.where("fim_applied").count()
    assert abs(applied / n - 0.30) < 0.03
    # identical salt -> identical cuts
    a = {(r.doc_id, r.len_prefix, r.len_middle) for r in t.collect()}
    b = {
        (r.doc_id, r.len_prefix, r.len_middle)
        for r in FM.fim_transform(docs, rate_ppm=300_000).collect()
    }
    assert a == b
    # different salt -> different cuts for a good share of applied docs
    c = FM.fim_transform(docs, rate_ppm=300_000, salt="fim1")
    moved = (
        t.where("fim_applied")
        .select("doc_id", F.col("len_prefix").alias("p0"))
        .join(c.select("doc_id", F.col("len_prefix").alias("p1")), "doc_id")
        .where("p0 != p1")
        .count()
    )
    assert moved > applied // 2


def test_middle_mass_near_one_third(spark):
    t = FM.fim_transform(_docs(spark, 20000), rate_ppm=1_000_000)
    row = t.agg(
        F.sum("len_middle").alias("m"),
        F.sum(F.col("len_prefix") + F.col("len_middle") + F.col("len_suffix")).alias("t"),
    ).collect()[0]
    assert abs(row.m / row.t - 1 / 3) < 0.03


def test_map_only_plan(spark):
    plan = FM.fim_transform(_docs(spark))._jdf.queryExecution(
    ).executedPlan().toString()
    assert "Exchange" not in plan
