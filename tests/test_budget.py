from __future__ import annotations

from hypothesis import given, settings, strategies as st

from go_nonrat_annotation_pipeline_spark.operators.budget import waterfill


def _run(spark, caps, budget):
    df = spark.createDataFrame(
        [(f"s{i}", c) for i, c in enumerate(caps)], "source string, cap long"
    )
    return {r.source: (r.cap, r.alloc) for r in waterfill(df, budget).collect()}


def test_mixed_funded_and_levelled(spark):
    # caps 5, 10, 100, 100; budget 55 → 5 and 10 fully funded,
    # the two big sources split the remaining 40 evenly
    out = _run(spark, [5, 10, 100, 100], 55)
    assert out["s0"] == (5, 5) and out["s1"] == (10, 10)
    assert out["s2"][1] == out["s3"][1] == 20
    assert sum(a for _, a in out.values()) == 55


def test_remainder_tokens_distributed(spark):
    # budget 7 over three equal caps → 3,2,2 (remainder to the
    # smallest (cap, source) order first)
    out = _run(spark, [100, 100, 100], 7)
    assert sorted(a for _, a in out.values()) == [2, 2, 3]
    assert out["s0"][1] == 3  # deterministic tie rule


def test_budget_exceeds_capacity(spark):
    out = _run(spark, [4, 6], 1000)
    assert out["s0"] == (4, 4) and out["s1"] == (6, 6)


@settings(max_examples=15, deadline=None)
@given(
    caps=st.lists(st.integers(0, 300), min_size=1, max_size=10),
    budget=st.integers(0, 1200),
)
def test_waterfill_invariants(spark, caps, budget):
    out = _run(spark, caps, budget)
    total_alloc = sum(a for _, a in out.values())
    assert total_alloc == min(budget, sum(caps))
    for cap, alloc in out.values():
        assert 0 <= alloc <= cap
    # levelled sources (alloc < cap) differ by at most one token
    lev = [a for c, a in out.values() if a < c]
    if lev:
        assert max(lev) - min(lev) <= 1
