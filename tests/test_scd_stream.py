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


def _stage(spark, rows, splits, tmp_path):
    """Write rows (already time-ordered) into len(splits) mtime-pinned
    parquet files under pytest-reclaimed tmp_path; splits are index cut
    points."""
    root = tempfile.mkdtemp(prefix="scd_stream_test_", dir=str(tmp_path))
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
    rows = [
        (
            r.user_id,
            r.attr,
            r.valid_from_us,
            r.valid_to_us,
            r.version,
            r.is_current,
        )
        for r in df.collect()
    ]
    # None-safe ordering: NULL attrs/bounds are legal values here
    return sorted(rows, key=lambda t: tuple((x is None, x) for x in t))


NULL_ROWS = [
    # user 4: NULL attr is a legal tracked value — a run like any
    # other. Open NULL-run must survive batch boundaries (merge at
    # [1]/[2] splits), close when a non-null arrives, and a non-null
    # run must close when NULL arrives (ADVICE r6 state-loss fix).
    (1, 4, datetime(2024, 1, 1, 0, 0), None),
    (2, 4, datetime(2024, 1, 1, 0, 1), None),
    (3, 4, datetime(2024, 1, 1, 0, 2), "a"),
    (4, 4, datetime(2024, 1, 1, 0, 3), None),
    # user 5: ends the stream on an open NULL run
    (5, 5, datetime(2024, 1, 1, 0, 1), "z"),
    (6, 5, datetime(2024, 1, 1, 0, 4), None),
]


def test_stream_equals_batch_rebuild_any_batching(spark, tmp_path):
    schema = "event_id long, user_id long, ts timestamp, event_type string"
    want = _canon(scd2_history(spark.createDataFrame(ROWS, schema)))
    for splits in ([3], [3, 6], [2, 4, 7]):
        staged = _stage(spark, ROWS, splits, tmp_path)
        got = _canon(scd2_dimension_stream(_stream(spark, staged)))
        assert got == want, f"splits={splits}"


def test_constant_key_never_splits(spark, tmp_path):
    staged = _stage(spark, ROWS, [3, 6], tmp_path)
    dim = scd2_dimension_stream(_stream(spark, staged))
    u2 = [r for r in dim.collect() if r.user_id == 2]
    # x-run spans batches 0,1,2 as ONE interval, then changes to y
    attrs = sorted((r.attr, r.version) for r in u2)
    assert attrs == [("x", 1), ("y", 2)]
    x = next(r for r in u2 if r.attr == "x")
    assert x.is_current == 0 and x.valid_to_us is not None


def test_single_open_interval_per_key(spark, tmp_path):
    staged = _stage(spark, ROWS, [4], tmp_path)
    dim = scd2_dimension_stream(_stream(spark, staged))
    cur = dim.where(F.col("is_current") == 1)
    assert cur.count() == cur.select("user_id").distinct().count() == 3


def test_null_attr_runs_maintained_equals_rebuild(spark, tmp_path):
    schema = "event_id long, user_id long, ts timestamp, event_type string"
    want = _canon(scd2_history(spark.createDataFrame(NULL_ROWS, schema)))
    # batch semantics: NULL runs collapse null-safely
    assert [
        (u, a, v) for (u, a, _f, _t, v, _c) in want
    ] == [
        # None-safe canon order puts non-null attrs first per key
        (4, "a", 2),
        (4, None, 1),
        (4, None, 3),
        (5, "z", 1),
        (5, None, 2),
    ]
    for splits in ([2], [2, 4], [1, 3, 5]):
        staged = _stage(spark, NULL_ROWS, splits, tmp_path)
        got = _canon(scd2_dimension_stream(_stream(spark, staged)))
        assert got == want, f"splits={splits}"
