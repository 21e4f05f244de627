"""Durable streaming bitemporal store
(streaming/bitemporal_stream.py): the drained view equals the batch
reconstruction, a mid-batch crash replays idempotently, duplicates are
value-invisible, and the as-of read works straight off the store."""

from __future__ import annotations

import os

from go_nonrat_annotation_pipeline_spark.operators.bitemporal import (
    bitemporal_history,
)
from go_nonrat_annotation_pipeline_spark.streaming.bitemporal_stream import (
    ASSERT_SCHEMA,
    bitemporal_view,
    make_bitemporal_handler,
)

ROWS = [
    (1, "a", 10, 100, 1),
    (1, "b", 20, 110, 2),
    (2, "x", 10, 105, 3),
    (1, "c", 10, 300, 4),   # late correction of user 1 / day 10
    (2, "x", 20, 310, 5),
]


def _batches():
    return [ROWS[:2], ROWS[2:4], ROWS[4:]]


def _view(spark, store, as_of=None):
    return sorted(
        tuple(r) for r in bitemporal_view(spark, store, as_of).collect()
    )


def _batch_truth(spark, as_of=None):
    df = spark.createDataFrame(ROWS, ASSERT_SCHEMA)
    return sorted(
        tuple(r)
        for r in bitemporal_history(df, as_of_us=as_of).collect()
    )


def test_drained_view_equals_batch_and_asof_reads(spark, tmp_path):
    store = str(tmp_path / "store")
    handler = make_bitemporal_handler(spark, store)
    for i, rows in enumerate(_batches()):
        handler(spark.createDataFrame(rows, ASSERT_SCHEMA), i)
    assert _view(spark, store) == _batch_truth(spark)
    # a past belief straight off the durable store
    assert _view(spark, store, as_of=200) == _batch_truth(spark, as_of=200)


def test_crash_replay_and_duplicates_are_invisible(spark, tmp_path):
    store = str(tmp_path / "store")
    handler = make_bitemporal_handler(spark, store)
    handler(spark.createDataFrame(_batches()[0], ASSERT_SCHEMA), 0)
    # crash window: batch 1 wrote a PARTIAL partition (only 1 of its 2
    # rows), then the process died; replay overwrites the partition
    partial = spark.createDataFrame(_batches()[1][:1], ASSERT_SCHEMA)
    partial.write.mode("overwrite").parquet(
        os.path.join(store, "admit_batch=1")
    )
    handler(spark.createDataFrame(_batches()[1], ASSERT_SCHEMA), 1)
    handler(spark.createDataFrame(_batches()[2], ASSERT_SCHEMA), 2)
    assert _view(spark, store) == _batch_truth(spark)
    # at-least-once delivery: re-appending batch 2 under a NEW id
    # duplicates its assertions, and the resolved view cannot tell
    handler(spark.createDataFrame(_batches()[2], ASSERT_SCHEMA), 3)
    assert _view(spark, store) == _batch_truth(spark)
