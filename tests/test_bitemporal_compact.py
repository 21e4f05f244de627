"""Policy-compacted bitemporal store (streaming/bitemporal_compact.py):
the folded store's view is byte-identical to the uncompacted
reconstruction — including the n_superseded audit — for every
reconstructible cutoff; reads below the knowledge horizon refuse
loudly; the store stays bounded at the live (key, valid) domain under
correction churn; an interrupted swap heals on the next read."""

from __future__ import annotations

import os
import shutil

import pytest

from go_nonrat_annotation_pipeline_spark.operators.bitemporal import (
    bitemporal_history,
)
from go_nonrat_annotation_pipeline_spark.streaming.bitemporal_stream import (
    ASSERT_SCHEMA,
)
from go_nonrat_annotation_pipeline_spark.streaming.bitemporal_compact import (
    bitemporal_view_compacted,
    fold_bitemporal_store,
    knowledge_horizon,
    make_compacting_bitemporal_handler,
    superseded_fraction,
)


def _churn_batches(keys=6, rounds=12):
    """Every round corrects the SAME (key, valid day) slots — the
    worst-case correction churn: live domain fixed, history linear."""
    t = 0
    out = []
    for r in range(rounds):
        rows = []
        for k in range(keys):
            for day in (10, 20):
                t += 1
                rows.append((k, f"v{r}", day, 1000 + t, t))
        out.append(rows)
    return out


def _truth(spark, all_rows, as_of=None):
    df = spark.createDataFrame(all_rows, ASSERT_SCHEMA)
    return sorted(
        tuple(r) for r in bitemporal_history(df, as_of_us=as_of).collect()
    )


def _cview(spark, store, as_of=None):
    return sorted(
        tuple(r)
        for r in bitemporal_view_compacted(spark, store, as_of).collect()
    )


def _parts(store):
    return [p for p in os.listdir(store) if p.startswith("admit_batch=")]


def test_churn_store_bounded_and_view_exact(spark, tmp_path):
    store = str(tmp_path / "store")
    audit = []
    handler = make_compacting_bitemporal_handler(
        spark, store, threshold=0.5, check_every=4, audit=audit
    )
    batches = _churn_batches(keys=6, rounds=12)
    for i, rows in enumerate(batches):
        handler(spark.createDataFrame(rows, ASSERT_SCHEMA), i)
    assert audit, "policy never fired under 12 rounds of full churn"
    # bounded: seed + at most check_every live partitions
    assert len(_parts(store)) <= 5, _parts(store)
    all_rows = [r for b in batches for r in b]
    assert _cview(spark, store) == _truth(spark, all_rows)
    # n_superseded must be exact across folds: every slot was corrected
    # 11 times, so each surviving interval start absorbed 11
    sup = {
        (r[0], r[2]): r[5]
        for r in bitemporal_view_compacted(spark, store).collect()
    }
    assert all(v == 11 for v in sup.values()), sup


def test_asof_horizon_guard_and_reads_above(spark, tmp_path):
    store = str(tmp_path / "store")
    handler = make_compacting_bitemporal_handler(
        spark, store, threshold=0.0, check_every=100
    )
    batches = _churn_batches(keys=3, rounds=4)
    for i, rows in enumerate(batches):
        handler(spark.createDataFrame(rows, ASSERT_SCHEMA), i)
    b, a = fold_bitemporal_store(spark, store)
    assert a < b
    horizon = knowledge_horizon(store)
    all_rows = [r for bb in batches for r in bb]
    assert horizon == max(r[3] for r in all_rows)
    # at or above the horizon: exact, including as-of reconstruction
    assert _cview(spark, store, as_of=horizon) == _truth(
        spark, all_rows, as_of=horizon
    )
    assert _cview(spark, store) == _truth(spark, all_rows)
    # below the horizon: refused, not silently rewritten
    with pytest.raises(ValueError, match="knowledge horizon"):
        bitemporal_view_compacted(spark, store, as_of_us=horizon - 1)


def test_post_fold_corrections_and_second_fold(spark, tmp_path):
    store = str(tmp_path / "store")
    rows1 = [(1, "a", 10, 100, 1), (1, "b", 10, 110, 2), (2, "x", 10, 105, 3)]
    spark.createDataFrame(rows1, ASSERT_SCHEMA).write.parquet(
        os.path.join(store, "admit_batch=0")
    )
    fold_bitemporal_store(spark, store)
    # corrections after the fold overwrite folded winners
    rows2 = [(1, "c", 10, 200, 4), (1, "d", 20, 210, 5)]
    spark.createDataFrame(rows2, ASSERT_SCHEMA).write.parquet(
        os.path.join(store, "admit_batch=1")
    )
    truth = _truth(spark, rows1 + rows2)
    assert _cview(spark, store) == truth
    # second fold: carries accumulate, horizon is monotone
    fold_bitemporal_store(spark, store)
    assert _cview(spark, store) == truth
    assert knowledge_horizon(store) == 210
    sup = {
        (r[0], r[2]): r[5]
        for r in bitemporal_view_compacted(spark, store).collect()
    }
    assert sup[(1, 10)] == 2  # a, b absorbed under c
    assert sup[(2, 10)] == 0


def test_superseded_fraction_and_empty_store(spark, tmp_path):
    store = str(tmp_path / "empty")
    os.makedirs(store)
    assert superseded_fraction(spark, store) == 0.0
    assert fold_bitemporal_store(spark, store) == (0, 0)


def test_interrupted_swap_heals_on_read(spark, tmp_path):
    store = str(tmp_path / "store")
    rows = [(1, "a", 10, 100, 1), (1, "b", 10, 110, 2)]
    spark.createDataFrame(rows, ASSERT_SCHEMA).write.parquet(
        os.path.join(store, "admit_batch=0")
    )
    truth = _truth(spark, rows)
    # simulate a crash between the two renames: store dir gone, the
    # complete folded copy still at .compact_tmp
    fold_bitemporal_store(spark, store)
    shutil.move(store, store + ".compact_tmp")
    assert not os.path.isdir(store)
    assert _cview(spark, store) == truth  # _recover finished rename 2
    assert os.path.isdir(store)
