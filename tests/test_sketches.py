"""Sketch operators: estimator accuracy, mergeability, and the
integer-exactness invariants the oracle hash gate relies on."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from go_nonrat_annotation_pipeline_spark.operators import sketches as SK

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def lineitem(spark):
    return spark.read.parquet(f"{SF}/lineitem.parquet").cache()


def _key():
    return F.concat_ws("|", "l_partkey", "l_suppkey")


def test_hll_estimate_within_tolerance(spark, lineitem):
    regs = [tuple(r) for r in SK.hll_registers(lineitem, _key(), p=6).collect()]
    true_n = lineitem.select(_key().alias("k")).distinct().count()
    est = SK.hll_estimate(regs, p=6)
    # standard error ~1.04/sqrt(64) = 13%; allow 3 sigma
    assert abs(est - true_n) / true_n < 0.40
    # register values are small positive integers (rho <= 55)
    assert all(0 <= r < 64 and 1 <= x <= 55 for r, x in regs)


def test_hll_merge_is_registerwise_max(spark, lineitem):
    """Union sketch == register-wise MAX of shard sketches."""
    a = lineitem.where("l_orderkey % 2 = 0")
    b = lineitem.where("l_orderkey % 2 = 1")
    ra = {r: x for r, x in SK.hll_registers(a, _key()).collect()}
    rb = {r: x for r, x in SK.hll_registers(b, _key()).collect()}
    ru = {r: x for r, x in SK.hll_registers(lineitem, _key()).collect()}
    merged = {r: max(ra.get(r, 0), rb.get(r, 0)) for r in set(ra) | set(rb)}
    assert merged == ru


def test_kmv_estimate_and_order(spark, lineitem):
    rows = SK.kmv_minima(lineitem, _key(), k=16).collect()
    assert [r["rank"] for r in rows] == list(range(1, 17))
    hvals = [r["hval"] for r in rows]
    assert hvals == sorted(hvals) and len(set(hvals)) == 16
    true_n = lineitem.select(_key().alias("k")).distinct().count()
    est = SK.kmv_estimate(hvals, 16)
    assert abs(est - true_n) / true_n < 0.75  # k=16 is coarse: 1/sqrt(16)=25%, 3 sigma


def test_kmv_fewer_than_k_is_exact(spark):
    df = spark.createDataFrame([(i % 5,) for i in range(50)], "k int")
    rows = SK.kmv_minima(df, F.col("k").cast("string"), k=32).collect()
    assert len(rows) == 5
    assert SK.kmv_estimate([r["hval"] for r in rows], 32) == 5.0


def test_cms_never_undercounts(spark):
    ev = spark.read.parquet(f"{SF}/events.parquet")
    probes = ev.select("event_type").distinct()
    est = {
        r["key"]: r["est_count"]
        for r in SK.cms_point_estimates(
            ev, F.col("event_type"), probes, "event_type"
        ).collect()
    }
    true = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type").agg(F.count("*").alias("n")).collect()
    }
    assert set(est) == set(true)
    for k in true:
        assert est[k] >= true[k]  # CMS is an upper bound, always
        # and with w=256 >> 5 distinct keys, collisions are bounded
        assert est[k] <= true[k] + ev.count() // 2


def test_cms_absent_key_small(spark):
    ev = spark.read.parquet(f"{SF}/events.parquet")
    probes = spark.createDataFrame([("nonexistent-type",)], "event_type string")
    [row] = SK.cms_point_estimates(
        ev, F.col("event_type"), probes, "event_type"
    ).collect()
    # not necessarily 0 (collisions), but bounded by eps*N = e/w * N
    assert row["est_count"] <= 3 * ev.count() * 3 // 256


# ---------------------------------------------------------------------------
# histogram quantile sketch
# ---------------------------------------------------------------------------
def test_hist_quantile_close_to_exact(spark, lineitem):
    lo, hi, nb = 0.0, 110_000.0, 128
    bins = SK.hist_bins(lineitem, F.col("l_extendedprice"), lo, hi, nb)
    state = [(r.bin, r.n) for r in bins.collect()]
    total = sum(n for _, n in state)
    assert total == lineitem.where(F.col("l_extendedprice").isNotNull()).count()
    exact = lineitem.selectExpr(
        "percentile(l_extendedprice, array(0.5, 0.95)) as p"
    ).first().p
    for q, want in zip((0.5, 0.95), exact):
        got = SK.hist_quantile(state, q, lo, hi, nb)
        # rank error bounded by one bin's mass -> value error ~<= 2 bin widths
        assert abs(got - want) <= 2 * (hi - lo) / nb, (q, got, want)


def test_hist_bins_merge_is_binwise_sum(spark, lineitem):
    lo, hi, nb = 0.0, 110_000.0, 32
    a = lineitem.where(F.col("l_orderkey") % 2 == 0)
    b = lineitem.where(F.col("l_orderkey") % 2 == 1)
    whole = dict(
        (r.bin, r.n)
        for r in SK.hist_bins(lineitem, F.col("l_extendedprice"), lo, hi, nb).collect()
    )
    pa = dict((r.bin, r.n) for r in SK.hist_bins(a, F.col("l_extendedprice"), lo, hi, nb).collect())
    pb = dict((r.bin, r.n) for r in SK.hist_bins(b, F.col("l_extendedprice"), lo, hi, nb).collect())
    merged = {k: pa.get(k, 0) + pb.get(k, 0) for k in set(pa) | set(pb)}
    assert merged == whole


def test_hist_bins_clamps_out_of_range(spark):
    df = spark.createDataFrame(
        [(-5.0,), (0.0,), (9.99,), (10.0,), (1e9,), (None,)], "x double"
    )
    got = dict(
        (r.bin, r.n)
        for r in SK.hist_bins(df, F.col("x"), 0.0, 10.0, 10).collect()
    )
    # -5 clamps to bin 0; 10.0 and 1e9 clamp to bin 9; NULL dropped
    assert got == {0: 2, 9: 3}


def test_hist_quantile_properties():
    """Pure-estimator properties (no Spark): bounded by [lo, hi] and
    monotone in q for arbitrary bin states."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=200, deadline=None)
    @given(
        st.lists(
            st.tuples(st.integers(0, 31), st.integers(1, 10_000)),
            min_size=1,
            max_size=32,
        ),
        st.lists(st.floats(0.01, 0.99), min_size=2, max_size=5),
    )
    def check(raw_bins, qs):
        # collapse duplicate bins (hist state has one row per bin)
        state = {}
        for b, n in raw_bins:
            state[b] = state.get(b, 0) + n
        bins = sorted(state.items())
        lo, hi, nb = 0.0, 320.0, 32
        vals = [SK.hist_quantile(bins, q, lo, hi, nb) for q in sorted(qs)]
        assert all(lo <= v <= hi for v in vals)
        assert vals == sorted(vals)  # monotone in q

    check()
