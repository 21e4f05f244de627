"""Plan-shape and semantics pins for the round-10 families that only
had oracle checks: semantic decontam must broadcast the benchmark side
and take its best match through an aggregate (no per-item window
exchange), clustering depth must separate the two layouts at the
theoretical extremes, and the exact quantiles must bracket correctly
at the edges (q=0 and q at a group of size 1)."""

from __future__ import annotations

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _plan(df):
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_semantic_decontam_broadcasts_and_aggregates(spark):
    from go_nonrat_annotation_pipeline_spark.plans.queries_semantic_decontam import (
        q_semantic_decontam,
    )

    df = q_semantic_decontam(spark, SF)
    plan = _plan(df)
    # benchmark side broadcast into the pair map
    assert "BroadcastNestedLoopJoin" in plan
    # best match via hash aggregate (map-side combinable), NOT a
    # per-item window sort
    assert "Window" not in plan
    assert "EvalPython" not in plan


def test_clustering_depth_extremes(spark):
    from go_nonrat_annotation_pipeline_spark.plans.queries_clustering_depth import (
        q_clustering_depth,
    )

    rows = {r.layout: r for r in q_clustering_depth(spark, SF).collect()}
    assert rows["arrival"].max_depth == rows["arrival"].n_files
    assert rows["clustered"].max_depth <= 2
    assert rows["clustered"].avg_depth_ppm < rows["arrival"].avg_depth_ppm


def test_exact_quantiles_bracket_small_groups(spark):
    """Hand-built groups: size 1 (all quantiles = the value), size 2
    (interpolation exact in ppm), size 4 at p25 boundary."""
    from go_nonrat_annotation_pipeline_spark.plans.queries_quantile_exact import (
        PPM,
    )
    from pyspark.sql.window import Window

    rows = [(1, 7), (2, 10), (2, 20), (3, 1), (3, 2), (3, 3), (3, 4)]
    df = spark.createDataFrame(rows, "g long, v long")
    w = Window.partitionBy("g").orderBy("v")
    ranked = (
        df.withColumn("rn", F.row_number().over(w))
        .withColumn(
            "n",
            F.count(F.lit(1)).over(
                Window.partitionBy("g").rowsBetween(
                    Window.unboundedPreceding, Window.unboundedFollowing
                )
            ),
        )
    )

    def quant(q):
        lo = ranked.where(
            F.expr(f"rn - 1 = ((n - 1) * {q}L) DIV {PPM}L")
        ).select("g", F.col("v").alias("a"), "n")
        hi = ranked.where(
            F.expr(f"rn - 1 = LEAST(n - 1, ((n - 1) * {q}L) DIV {PPM}L + 1)")
        ).select("g", F.col("v").alias("b"))
        return {
            r.g: r.vp
            for r in lo.join(hi, "g")
            .select(
                "g",
                F.expr(
                    f"CAST(a * {PPM}L + (b - a) * "
                    f"(((n - 1) * {q}L) % {PPM}L) AS BIGINT)"
                ).alias("vp"),
            )
            .collect()
        }

    p50 = quant(500_000)
    assert p50[1] == 7 * PPM                      # singleton
    assert p50[2] == 15 * PPM                     # midpoint of 10, 20
    assert p50[3] == 2_500_000                    # 2.5 over 1..4
    p0 = quant(0)
    assert p0[3] == 1 * PPM                       # q=0 -> min
    p25 = quant(250_000)
    assert p25[3] == 1_750_000                    # 1.75 over 1..4
