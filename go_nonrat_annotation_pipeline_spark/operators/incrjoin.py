"""Incremental JOIN view maintenance (delta-join algebra).

The join sibling of operators/incragg.py: a materialized two-table join
view over 100 TB fact tables must follow BOTH tables through an
insert-only CDC batch without re-joining the full bases. The classical
delta rule (Blakeley/Larson/Tompa 1986; Gupta & Mumick 1995) for
inserts ΔL, ΔR against bases L₀, R₀:

    Δ(L ⋈ R) = ΔL ⋈ R₀  ∪  L₀ ⋈ ΔR  ∪  ΔL ⋈ ΔR

so the maintained view is V₁ = V₀ ∪ Δ(L ⋈ R). Cost: two
delta-sized-probe joins against the bases plus one delta×delta join —
at scale each probe side is batch-sized, broadcastable when the batch
is small, and the full L₁ ⋈ R₁ recompute (the oracle) is never run.

The maintained ≡ recompute contract is checked the same way incragg's
is: the Spark side folds deltas, the DuckDB oracle recomputes the join
over the full post-delta tables, and the driver hash-compares.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def delta_join(
    base_l: DataFrame,
    delta_l: DataFrame,
    base_r: DataFrame,
    delta_r: DataFrame,
    on: str | list[str],
) -> DataFrame:
    """Δ(L ⋈ R) for insert-only deltas: the three-term delta expansion.

    Each term touches at most one base; bases are probed, never
    re-joined against each other.
    """
    return (
        delta_l.join(base_r, on)
        .unionByName(base_l.join(delta_r, on))
        .unionByName(delta_l.join(delta_r, on))
    )


def join_view_maintain(
    view0: DataFrame,
    base_l: DataFrame,
    delta_l: DataFrame,
    base_r: DataFrame,
    delta_r: DataFrame,
    on: str | list[str],
) -> DataFrame:
    """V₁ = V₀ ∪ Δ(L ⋈ R). ``view0`` must be L₀ ⋈ R₀ with the same
    column set the delta expansion produces (select before calling)."""
    return view0.unionByName(delta_join(base_l, delta_l, base_r, delta_r, on))
