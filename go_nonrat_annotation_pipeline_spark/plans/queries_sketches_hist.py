"""Histogram-quantile sketch query (operators/sketches.hist_bins) —
registered AFTER the round-4 correctness window (plans/registry.py);
verified by tools/compare.py locally this round, leads the round-5
rotation. Separate from queries_sketches because that module sits
INSIDE the window: appending here would shift every later slot."""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators import sketches as SK
from ..sources.testdata import load_table
from .registry import register

_LO, _HI, _BINS = 0.0, 500_000.0, 64


@register(
    "q_hist_quantile_state",
    SK.sql_hist_bins("orders", "o_totalprice", _LO, _HI, _BINS),
    doc="mergeable equal-width histogram state over o_totalprice — "
    "shuffle bounded at n_bins rows/partition; quantiles derived from "
    "the state in tests (operators/sketches.hist_bins/hist_quantile)",
)
def q_hist_quantile_state(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    return SK.hist_bins(orders, F.col("o_totalprice"), _LO, _HI, _BINS)
