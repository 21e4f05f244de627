"""Signed-store compaction (streaming/ivm_compact.py): the view must be
byte-identical across a compaction, store row counts must DROP after
delete-heavy churn, maintenance must continue correctly on compacted
bases (magnitude signs flow through the delta algebra), and an
interrupted swap must recover."""

from __future__ import annotations

import os
import shutil

from pyspark.sql import functions as F

from go_nonrat_annotation_pipeline_spark.streaming.ivm_compact import (
    _recover,
    compact_ivm_retract,
    compact_signed_store,
)
from go_nonrat_annotation_pipeline_spark.streaming.ivm_retract import (
    make_ivm_retract_handler,
    read_view_net,
)

SCHEMA = "side string, op string, k long, attr string, qty long"


def _seed_empty(spark, l_dir, r_dir):
    for path, ddl in ((l_dir, "k long, attr string"), (r_dir, "k long, qty long")):
        spark.createDataFrame([], ddl).withColumn(
            "sign", F.lit(1).cast("long")
        ).write.mode("overwrite").parquet(os.path.join(path, "admit_batch=-1"))


def _churn_batches(rounds: int):
    """Delete-heavy churn: each round inserts then deletes the same L
    row for k=1 (net-zero tombstone pairs accumulate) plus a surviving
    R increment for k=2."""
    out = []
    for i in range(rounds):
        out.append(
            [
                ("L", "I", 1, f"tmp{i}", None),
                ("L", "D", 1, f"tmp{i}", None),
                ("R", "I", 2, None, 100 + i),
            ]
        )
    # a stable join result: L(2) x the accumulated R(2) rows
    out.append([("L", "I", 2, "keep", None)])
    return out


def _store_rows(spark, path, ddl, part_col):
    from go_nonrat_annotation_pipeline_spark.streaming.ivm_compact import (
        read_signed_store,
    )

    return read_signed_store(spark, path, ddl, part_col).count()


def _run(spark, tmp_path, batches):
    l_dir, r_dir, v_dir = (
        str(tmp_path / "l"),
        str(tmp_path / "r"),
        str(tmp_path / "v"),
    )
    _seed_empty(spark, l_dir, r_dir)
    handler = make_ivm_retract_handler(spark, l_dir, r_dir, v_dir)
    for i, rows in enumerate(batches):
        handler(spark.createDataFrame(rows, SCHEMA), i)
    return l_dir, r_dir, v_dir, handler, len(batches)


def test_view_identical_and_stores_shrink(spark, tmp_path):
    batches = _churn_batches(6)
    l_dir, r_dir, v_dir, _, _ = _run(spark, tmp_path, batches)
    before = sorted(tuple(r) for r in read_view_net(spark, v_dir).collect())
    l0 = _store_rows(spark, l_dir, "k long, attr string, sign long", "admit_batch")
    v0 = _store_rows(spark, v_dir, "k long, attr string, qty long, sign long", "batch")
    stats = compact_ivm_retract(spark, l_dir, r_dir, v_dir)
    after = sorted(tuple(r) for r in read_view_net(spark, v_dir).collect())
    assert after == before and len(before) == 6  # L(2,keep) x 6 R rows
    # 6 insert/delete tombstone pairs for k=1 net-folded away
    assert stats["l"][1] < stats["l"][0] and stats["l"][0] == l0
    assert stats["l"][1] == 1  # only L(2,'keep') survives
    assert stats["view"][1] <= stats["view"][0] and stats["view"][0] == v0
    # exactly one partition dir left per store
    for d, pc in ((l_dir, "admit_batch"), (r_dir, "admit_batch"), (v_dir, "batch")):
        parts = [p for p in os.listdir(d) if p.startswith(pc + "=")]
        assert parts == [f"{pc}=-1"]


def test_maintenance_continues_on_compacted_bases(spark, tmp_path):
    """Magnitude signs: compact a store where a row has multiplicity 2,
    keep maintaining, and check the final view against a from-scratch
    replay of the full feed on an uncompacted twin."""
    first = [
        [("L", "I", 1, "a", None), ("R", "I", 1, None, 10), ("R", "I", 1, None, 10)],
        [("L", "D", 1, "a", None), ("L", "I", 1, "a2", None)],
    ]
    more = [
        [("R", "I", 1, None, 11), ("R", "D", 1, None, 10)],  # one of the dup 10s goes
        [("L", "I", 2, "b", None), ("R", "I", 2, None, 20)],
    ]
    l_dir, r_dir, v_dir, handler, n = _run(spark, tmp_path, first)
    compact_ivm_retract(spark, l_dir, r_dir, v_dir)
    for j, rows in enumerate(more):
        handler(spark.createDataFrame(rows, SCHEMA), n + j)
    got = sorted(tuple(r) for r in read_view_net(spark, v_dir).collect())

    twin = tmp_path / "twin"
    tl, tr, tv, thandler, tn = _run(spark, twin, first)
    for j, rows in enumerate(more):
        thandler(spark.createDataFrame(rows, SCHEMA), tn + j)
    want = sorted(tuple(r) for r in read_view_net(spark, tv).collect())
    assert got == want
    # and the multiset is right: k=1 keeps one qty=10 and the qty=11
    assert got == [(1, "a2", 10), (1, "a2", 11), (2, "b", 20)]


def test_net_negative_rows_survive_compaction(spark, tmp_path):
    """A delete awaiting its out-of-order insert must stay as a −1 row
    through compaction and cancel when the insert finally arrives."""
    first = [[("L", "D", 7, "late", None), ("R", "I", 7, None, 70)]]
    l_dir, r_dir, v_dir, handler, n = _run(spark, tmp_path, first)
    compact_ivm_retract(spark, l_dir, r_dir, v_dir)
    # the -1 L row must still be there (not dropped as "net <= 0")
    from go_nonrat_annotation_pipeline_spark.streaming.ivm_compact import (
        read_signed_store,
    )

    lrows = read_signed_store(
        spark, l_dir, "k long, attr string, sign long", "admit_batch"
    ).collect()
    assert [(r.k, r.attr, r.sign) for r in lrows] == [(7, "late", -1)]
    handler(
        spark.createDataFrame(
            [("L", "I", 7, "late", None), ("L", "I", 8, "p8", None)], SCHEMA
        ),
        n,
    )
    got = sorted(tuple(r) for r in read_view_net(spark, v_dir).collect())
    assert got == []  # k=7 insert+delete net to zero; k=8 has no R match


def test_interrupted_swap_recovers(spark, tmp_path):
    batches = _churn_batches(2)
    l_dir, r_dir, v_dir, _, _ = _run(spark, tmp_path, batches)
    before = sorted(tuple(r) for r in read_view_net(spark, v_dir).collect())

    # window A: tmp written, store intact (crash before rmtree) — a new
    # compaction must discard the stale tmp and run cleanly
    tmp = l_dir + ".compact_tmp"
    os.makedirs(os.path.join(tmp, "admit_batch=-1"), exist_ok=True)
    compact_signed_store(spark, l_dir, "k long, attr string, sign long")
    assert not os.path.isdir(tmp)

    # window B: store removed, rename not done (crash between) — the
    # completed tmp IS the store; recovery renames it into place
    os.rename(v_dir, tmp_v := v_dir + ".compact_tmp")
    _recover(v_dir)
    assert os.path.isdir(v_dir) and not os.path.isdir(tmp_v)
    after = sorted(tuple(r) for r in read_view_net(spark, v_dir).collect())
    assert after == before


def test_rename_only_swap_recovers_every_crash_point(spark, tmp_path):
    """ADVICE r9: the swap must never leave a truncated store. Simulate
    each crash point of write tmp → rename store→old → rename tmp→store
    → delete old, and assert the view reads identically after recovery."""
    batches = _churn_batches(3)
    l_dir, r_dir, v_dir, _, _ = _run(spark, tmp_path, batches)
    before = sorted(tuple(r) for r in read_view_net(spark, v_dir).collect())
    tmp, old = v_dir + ".compact_tmp", v_dir + ".compact_old"

    # crash point 1: tmp written (complete fold), store intact — the
    # uncommitted fold is discarded; original store wins
    compact_signed_store(spark, v_dir, "k long, attr string, qty long, sign long", "batch")
    compacted = sorted(tuple(r) for r in read_view_net(spark, v_dir).collect())
    assert compacted == before
    shutil.copytree(v_dir, tmp)  # stand-in for a completed fold
    _recover(v_dir)
    assert not os.path.isdir(tmp) and not os.path.isdir(old)
    assert sorted(tuple(r) for r in read_view_net(spark, v_dir).collect()) == before

    # crash point 2: rename 1 done (store → old), rename 2 not — the
    # complete tmp becomes the store, old is swept
    shutil.copytree(v_dir, tmp)
    os.rename(v_dir, old)
    _recover(v_dir)
    assert os.path.isdir(v_dir) and not os.path.isdir(tmp) and not os.path.isdir(old)
    assert sorted(tuple(r) for r in read_view_net(spark, v_dir).collect()) == before

    # crash point 3: both renames done, old not yet deleted — the swap
    # committed; recovery only finishes the cleanup
    shutil.copytree(v_dir, old)
    _recover(v_dir)
    assert os.path.isdir(v_dir) and not os.path.isdir(old)
    assert sorted(tuple(r) for r in read_view_net(spark, v_dir).collect()) == before

    # defensive: store and tmp both missing, old present (cannot arise
    # under the protocol) — restore the original rather than lose it
    os.rename(v_dir, old)
    _recover(v_dir)
    assert os.path.isdir(v_dir) and not os.path.isdir(old)
    assert sorted(tuple(r) for r in read_view_net(spark, v_dir).collect()) == before


def test_folded_frontier_marker_keeps_committed_view_readable(
    spark, tmp_path
):
    """ADVICE r10 #2: a fold replaces every admit partition with the
    ``=-1`` seed, which used to collapse committed_batch_frontier to -1
    (or None) and make the frontier-filtered read_view_net silently
    return an empty/partial view. The ``_folded_frontier`` marker must
    preserve the frontier across folds — including the asymmetric case
    where only one base store has been compacted."""
    from go_nonrat_annotation_pipeline_spark.streaming.ivm_compact import (
        folded_frontier,
    )
    from go_nonrat_annotation_pipeline_spark.streaming.ivm_retract import (
        committed_batch_frontier,
    )

    batches = _churn_batches(5)  # batch ids 0..5
    l_dir, r_dir, v_dir, _, n = _run(spark, tmp_path, batches)
    want = sorted(tuple(r) for r in read_view_net(spark, v_dir).collect())
    assert committed_batch_frontier(l_dir, r_dir) == n - 1

    # fold ONLY the left base (the policy compacts stores independently
    # — per-store tombstone fractions diverge)
    compact_signed_store(spark, l_dir, "k long, attr string, sign long")
    assert folded_frontier(l_dir) == n - 1
    assert committed_batch_frontier(l_dir, r_dir) == n - 1
    got = sorted(
        tuple(r) for r in read_view_net(spark, v_dir, l_dir, r_dir).collect()
    )
    assert got == want

    # fold the right base too — both sides now marker-covered
    compact_signed_store(spark, r_dir, "k long, qty long, sign long")
    assert committed_batch_frontier(l_dir, r_dir) == n - 1
    got = sorted(
        tuple(r) for r in read_view_net(spark, v_dir, l_dir, r_dir).collect()
    )
    assert got == want

    # a second fold of a seed-only store must not regress the marker
    compact_signed_store(spark, l_dir, "k long, attr string, sign long")
    assert folded_frontier(l_dir) == n - 1

    # crash window AFTER the fold: batch n writes view + L admit, dies
    # before the R admit — the new view partition must stay excluded
    # (covered by neither R's explicit ids nor its marker)
    spark.createDataFrame(
        [(9, "phantom", 1)], "k long, attr string, sign long"
    ).write.mode("overwrite").parquet(
        os.path.join(l_dir, f"admit_batch={n}")
    )
    spark.createDataFrame(
        [(9, "phantom", 999, 1)], "k long, attr string, qty long, sign long"
    ).write.mode("overwrite").parquet(os.path.join(v_dir, f"batch={n}"))
    assert committed_batch_frontier(l_dir, r_dir) == n - 1
    got = sorted(
        tuple(r) for r in read_view_net(spark, v_dir, l_dir, r_dir).collect()
    )
    assert got == want
