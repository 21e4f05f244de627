"""Tests for iterate-to-fixpoint closure operators (SURVEY.md §2.3 J4/J10)."""

from __future__ import annotations

from go_nonrat_annotation_pipeline_spark.operators.closure import (
    resolve_history,
    transitive_descendants,
)


def test_descendants_diamond(spark):
    # DAG: 1 -> {2,3} -> 4 (diamond), 5 isolated
    edges = spark.createDataFrame(
        [(2, 1), (3, 1), (4, 2), (4, 3), (6, 5)], "child int, parent int"
    )
    seeds = spark.createDataFrame([(1,)], "node int")
    out = {r.node for r in transitive_descendants(edges, seeds).collect()}
    assert out == {1, 2, 3, 4}


def test_descendants_self_loop_ignored(spark):
    edges = spark.createDataFrame([(1, 1), (2, 1)], "child int, parent int")
    seeds = spark.createDataFrame([(1,)], "node int")
    out = {r.node for r in transitive_descendants(edges, seeds).collect()}
    assert out == {1, 2}


def test_history_chain_two_hop(spark):
    # 10 -> 11 -> 12 (terminal), 20 no history, 30 -> 30 self-loop (guarded)
    edges = spark.createDataFrame(
        [(10, 11), (11, 12), (30, 30)], "old_id int, new_id int"
    )
    ids = spark.createDataFrame([(10,), (20,), (30,)], "id int")
    out = {r.id: r.resolved_id for r in resolve_history(edges, ids).collect()}
    assert out == {10: 12, 20: 20, 30: 30}


def test_history_branch_takes_max(spark):
    # mirrors rgdcore SELECT MAX(new_rgd_id): 1 -> {5, 9}: resolves via 9
    edges = spark.createDataFrame([(1, 5), (1, 9)], "old_id int, new_id int")
    ids = spark.createDataFrame([(1,)], "id int")
    out = {r.id: r.resolved_id for r in resolve_history(edges, ids).collect()}
    assert out == {1: 9}


def test_salted_join_matches_plain(spark):
    """Salted equi-join is result-identical to the plain join."""
    from go_nonrat_annotation_pipeline_spark.operators.util import (
        salted_group_count,
        salted_join,
    )
    from pyspark.sql import functions as F

    facts = spark.range(0, 10000).select(
        (F.col("id") % 5).alias("k"), F.col("id").alias("v")
    )
    dim = spark.createDataFrame([(i, f"d{i}") for i in range(5)], ["k", "label"])

    plain = facts.join(dim, "k").select("k", "v", "label")
    salted = salted_join(facts, dim, "k", n_salts=8).select("k", "v", "label")
    assert plain.count() == salted.count() == 10000
    assert plain.exceptAll(salted).isEmpty()

    counts = {r.k: r["count"] for r in salted_group_count(facts, "k", 8).collect()}
    assert counts == {i: 2000 for i in range(5)}
