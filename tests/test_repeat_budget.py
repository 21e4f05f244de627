"""Epoch/repeat budget planner (plans/queries_repeat_budget.py): the
allocation is token-exact at the declared ratio, the waterline is real
(some sources at ceiling, some levelled), no source exceeds its epoch
ceiling, and levelled sources all sit at the common waterline."""

from __future__ import annotations

from go_nonrat_annotation_pipeline_spark.plans.queries_repeat_budget import (
    _BUDGET_X_PPM,
    PPM,
    q_epoch_repeat_budget,
)

SF = "/root/testdata/sf0.001"


def test_allocation_exact_and_waterline_real(spark):
    rows = q_epoch_repeat_budget(spark, SF).collect()
    ta = sum(r.alloc_tokens for r in rows)
    tu = sum(r.uniq for r in rows)
    assert abs(ta - tu * _BUDGET_X_PPM // PPM) <= 1  # token-exact
    capped = [r for r in rows if r.at_ceiling]
    level = [r for r in rows if not r.at_ceiling]
    assert capped and level  # both regimes present
    for r in rows:
        # never beyond the quality-tier ceiling
        assert r.epochs_ppm <= r.max_epochs * PPM
        assert r.alloc_tokens <= r.uniq * r.max_epochs
    # levelled sources share one waterline (± the 1-token remainder)
    allocs = sorted(r.alloc_tokens for r in level)
    assert allocs[-1] - allocs[0] <= 1
