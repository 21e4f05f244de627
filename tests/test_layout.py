"""Z-order and compaction-planning layout operators."""

from __future__ import annotations

from pyspark.sql import functions as F

from go_nonrat_annotation_pipeline_spark.operators import layout as L


def _z_ref(x: int, y: int, bits: int = 16) -> int:
    z = 0
    for b in range(bits):
        z |= ((x >> b) & 1) << (2 * b)
        z |= ((y >> b) & 1) << (2 * b + 1)
    return z


def test_z_value_matches_reference(spark):
    rows = [(0, 0), (1, 0), (0, 1), (3, 5), (65535, 65535), (12345, 54321)]
    df = spark.createDataFrame(rows, "x long, y long")
    got = df.select("x", "y", L.z_value(F.col("x"), F.col("y")).alias("z")).collect()
    for r in got:
        assert r["z"] == _z_ref(r["x"], r["y"]), (r["x"], r["y"])


def test_z_value_locality(spark):
    """Sorting by z then bucketing must give per-bucket envelopes on BOTH
    dims that are far tighter than the global range — the file-skipping
    property. With a single-column sort, the second dim's envelope per
    bucket would stay ~global."""
    rows = [(x, y) for x in range(0, 256, 4) for y in range(0, 256, 4)]
    df = spark.createDataFrame(rows, "x long, y long")
    z = df.select("x", "y", L.z_value(F.col("x"), F.col("y"), 8).alias("z"))
    buckets = (
        z.groupBy(F.floor(F.col("z") / 1024).alias("bkt"))
        .agg(
            (F.max("x") - F.min("x")).alias("xr"),
            (F.max("y") - F.min("y")).alias("yr"),
        )
        .collect()
    )
    # 2^10 z-range per bucket = 32x32 tile -> both envelopes <= 31 << 255
    assert all(r["xr"] <= 31 and r["yr"] <= 31 for r in buckets)
    assert len(buckets) == 64


def test_compaction_plan_properties(spark):
    rows = [(f"u{i:03d}", (i * 37) % 900 + 100) for i in range(50)]
    df = spark.createDataFrame(rows, "unit string, size long")
    plan = L.compaction_plan(df, "size", ["unit"], target=1000).collect()
    bins: dict[int, int] = {}
    for r in sorted(plan, key=lambda r: r["unit"]):
        bins[r["bin"]] = bins.get(r["bin"], 0) + r["size"]
    # bins are contiguous from 0 and every bin but possibly the last holds
    # >= target - max_unit ... <= target + max_unit (greedy boundary slack)
    assert sorted(bins) == list(range(max(bins) + 1))
    for b, sz in bins.items():
        if b < max(bins):
            assert sz <= 1000 + 999  # a unit never splits
            assert sz >= 1000 - 999


def test_compaction_oversize_unit_alone_in_bins(spark):
    df = spark.createDataFrame(
        [("a", 100), ("big", 5000), ("z", 100)], "unit string, size long"
    )
    plan = {r["unit"]: r["bin"] for r in L.compaction_plan(df, "size", ["unit"], 1000).collect()}
    # 'big' starts at cumsum 100 -> bin 0, and 'z' lands at cumsum 5100 -> bin 5:
    # the oversize unit pushes the next unit far past, sharing with no one after it
    assert plan["a"] == 0 and plan["big"] == 0 and plan["z"] == 5
