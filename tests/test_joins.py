"""Range-bin join and bloom-prefilter join: result equivalence to the
naive formulations, plus the plan properties that make them scale."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from go_nonrat_annotation_pipeline_spark.operators import joins as J

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events(spark):
    return spark.read.parquet(f"{SF}/events.parquet").cache()


def _purchases(events):
    return events.where("event_type = 'purchase'").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("lo"),
        (F.col("ts") + F.expr("interval 1 hour")).alias("hi"),
    )


def _clicks(events):
    return events.where("event_type = 'click'").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("c_user"),
        "ts",
    )


def test_range_bin_join_equals_theta_join(spark, events):
    got = (
        J.range_bin_join(
            _clicks(events), _purchases(events), "c_user", "p_user",
            "ts", "lo", "hi", bin_seconds=3600,
        )
        .select("purchase_id", "click_id")
        .collect()
    )
    naive = (
        _clicks(events)
        .join(
            _purchases(events),
            (F.col("c_user") == F.col("p_user"))
            & (F.col("ts") >= F.col("lo"))
            & (F.col("ts") < F.col("hi")),
        )
        .select("purchase_id", "click_id")
        .collect()
    )
    assert sorted(map(tuple, got)) == sorted(map(tuple, naive))
    assert len(got) > 0  # non-vacuous at sf0.001


def test_range_bin_join_no_duplicates(spark, events):
    out = J.range_bin_join(
        _clicks(events), _purchases(events), "c_user", "p_user",
        "ts", "lo", "hi", bin_seconds=600,  # intervals span ~7 bins
    ).select("purchase_id", "click_id")
    assert out.count() == out.distinct().count()


def test_range_bin_join_plan_is_hash_join(spark, events):
    plan = J.range_bin_join(
        _clicks(events), _purchases(events), "c_user", "p_user",
        "ts", "lo", "hi", bin_seconds=3600,
    )._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan


def test_bin_alignment_edge_cases(spark):
    # interval ending exactly on a bin boundary must not match a probe
    # at that boundary (hi exclusive), and a probe exactly at lo must
    rows = [(1, "2024-01-01 00:00:00", "2024-01-01 01:00:00")]
    build = spark.createDataFrame(rows, "k int, lo string, hi string").select(
        "k", F.col("lo").cast("timestamp"), F.col("hi").cast("timestamp")
    )
    probes = spark.createDataFrame(
        [(1, 10, "2024-01-01 00:00:00"), (1, 11, "2024-01-01 01:00:00")],
        "k int, pid int, ts string",
    ).select("k", "pid", F.col("ts").cast("timestamp"))
    got = J.range_bin_join(
        probes, build.withColumnRenamed("k", "bk"), "k", "bk", "ts", "lo", "hi",
        bin_seconds=3600,
    ).select("pid").collect()
    assert [r["pid"] for r in got] == [10]


def test_bloom_prefilter_join_equals_plain_join(spark, events):
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    dim = orders.where("o_orderstatus = 'F'").select("o_orderkey")
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    got = (
        J.bloom_prefilter_join(li, dim, "l_orderkey", "o_orderkey")
        .select("l_orderkey", "l_linenumber")
        .collect()
    )
    naive = (
        li.join(dim, li["l_orderkey"] == dim["o_orderkey"])
        .select("l_orderkey", "l_linenumber")
        .collect()
    )
    assert sorted(map(tuple, got)) == sorted(map(tuple, naive))
    assert len(got) > 0


def test_bloom_bitset_prunes(spark):
    """A probe side with mostly-absent keys must shrink before the join."""
    build = spark.range(0, 50).select(F.col("id").alias("k"))
    probe = spark.range(0, 20000).select((F.col("id") % 5000).alias("k"))
    bits = J.bloom_bitset(build, F.col("k").cast("string"))
    assert bits.count() <= 1024  # 2^16 bits / 64-bit words
    out = J.bloom_prefilter_join(probe, build, "k", "k")
    # exact join row count: keys 0..49 appear 4x each in probe
    assert out.count() == 200
