from __future__ import annotations

import os
import shutil
import tempfile
from datetime import datetime

from pyspark.sql import functions as F

from go_nonrat_annotation_pipeline_spark.operators.scd import scd2_history
from go_nonrat_annotation_pipeline_spark.streaming.scd_stream import (
    scd2_dimension_stream,
)


def _stage(spark, rows, splits):
    """Write rows (already time-ordered) into len(splits) mtime-pinned
    parquet files; splits are index cut points."""
    root = tempfile.mkdtemp(prefix="scd_stream_test_")
    staged = os.path.join(root, "events")
    os.makedirs(staged)
    schema = "event_id long, user_id long, ts timestamp, event_type string"
    base = 1_600_000_000
    bounds = [0, *splits, len(rows)]
    for i in range(len(bounds) - 1):
        chunk = rows[bounds[i]:bounds[i + 1]]
        tmp = os.path.join(root, f"tmp_{i}")
        spark.createDataFrame(chunk, schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(tmp)
        part = next(p for p in os.listdir(tmp) if p.endswith(".parquet"))
        dst = os.path.join(staged, f"b{i}.parquet")
        shutil.move(os.path.join(tmp, part), dst)
        os.utime(dst, (base + i, base + i))
        shutil.rmtree(tmp)
    return staged


def _stream(spark, staged):
    return (
        spark.readStream.schema(
            "event_id long, user_id long, ts timestamp, event_type string"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(staged)
    )


ROWS = [
    # user 1: run of a, then b (change lands mid-batch-boundary below)
    (1, 1, datetime(2024, 1, 1, 0, 0), "a"),
    (2, 1, datetime(2024, 1, 1, 0, 1), "a"),
    (3, 1, datetime(2024, 1, 1, 0, 2), "b"),
    # user 2: constant across every batch (open interval must MERGE
    # through both batch boundaries, never split)
    (4, 2, datetime(2024, 1, 1, 0, 0), "x"),
    (5, 2, datetime(2024, 1, 1, 0, 3), "x"),
    (6, 2, datetime(2024, 1, 1, 0, 6), "x"),
    # user 3: appears only in the last batch (new key mid-stream)
    (7, 3, datetime(2024, 1, 1, 0, 7), "p"),
    (8, 1, datetime(2024, 1, 1, 0, 8), "a"),
    (9, 2, datetime(2024, 1, 1, 0, 9), "y"),
]


def _canon(df):
    return sorted(
        (
            r.user_id,
            r.attr,
            r.valid_from_us,
            r.valid_to_us,
            r.version,
            r.is_current,
        )
        for r in df.collect()
    )


def test_stream_equals_batch_rebuild_any_batching(spark):
    schema = "event_id long, user_id long, ts timestamp, event_type string"
    want = _canon(scd2_history(spark.createDataFrame(ROWS, schema)))
    for splits in ([3], [3, 6], [2, 4, 7]):
        staged = _stage(spark, ROWS, splits)
        got = _canon(scd2_dimension_stream(_stream(spark, staged)))
        assert got == want, f"splits={splits}"


def test_constant_key_never_splits(spark):
    staged = _stage(spark, ROWS, [3, 6])
    dim = scd2_dimension_stream(_stream(spark, staged))
    u2 = [r for r in dim.collect() if r.user_id == 2]
    # x-run spans batches 0,1,2 as ONE interval, then changes to y
    attrs = sorted((r.attr, r.version) for r in u2)
    assert attrs == [("x", 1), ("y", 2)]
    x = next(r for r in u2 if r.attr == "x")
    assert x.is_current == 0 and x.valid_to_us is not None


def test_single_open_interval_per_key(spark):
    staged = _stage(spark, ROWS, [4])
    dim = scd2_dimension_stream(_stream(spark, staged))
    cur = dim.where(F.col("is_current") == 1)
    assert cur.count() == cur.select("user_id").distinct().count() == 3
