"""Bucketed-layout plan audit: a merge-key join against the bucketed
FULL_ANNOT table must not shuffle or sort the table side — the physical
justification for the engine's 100 TB MERGE strategy (SURVEY.md §4)."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from go_nonrat_annotation_pipeline_spark.pipeline.config import PipelineConfig
from go_nonrat_annotation_pipeline_spark.pipeline.fixtures import seed_full_annot
from go_nonrat_annotation_pipeline_spark.pipeline.sink import AnnotStore

from test_plans import plan


def test_bucketed_merge_join_no_table_side_shuffle(spark, tmp_path):
    cfg = PipelineConfig()
    store = AnnotStore(spark, str(tmp_path / "fa"))
    store.seed(seed_full_annot(spark, cfg))
    store.save_bucketed("fa_bucketed", n_buckets=4)

    table = spark.table("fa_bucketed")
    incoming = store.read().select(
        "term_acc", "annotated_object_rgd_id", F.lit("new").alias("notes2")
    )
    joined = table.join(
        incoming, ["term_acc", "annotated_object_rgd_id"], "left"
    )
    # disable auto-broadcast so the join exercises the bucketed path the
    # way a 100 TB incoming batch would
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        p = plan(joined)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")

    assert "SortMergeJoin" in p
    # exactly ONE exchange: the incoming side; the bucketed scan feeds the
    # join pre-partitioned (and pre-sorted, thanks to sortBy)
    assert p.count(") Exchange") == 1
    assert "SelectedBucketsCount" in p
