"""Chinchilla-last sequencing property (VERDICT r8 next-round #7).

The reference pins the order: every producer species runs (including
its stale delete) BEFORE the chinchilla DB read-back, and the rat-ISO
stale delete runs last (GoNonratAnnotationPipeline.java:114-115 "Note:
chinchilla processing must run as the last species!", :124-125). The
constraint is documented in pipeline/run.py but until now nothing
failed if a refactor reordered it.

The load-bearing cascade this test pins: when a source chinchilla
annotation disappears from its feed, ONE run must (a) stale-delete the
direct annotation in its producer job, so that (b) the read-back —
which re-projects the STORE — no longer derives its rat-ISO twin, so
that (c) the final rat-ISO stale delete removes the twin. Run the
read-back BEFORE the producer's delete and step (b) still sees the
doomed row, re-derives the ISO annotation, refreshes it, and the final
delete spares an ORPHAN whose source is gone — silently wrong forever
after (the orphan is refreshed again every subsequent run).

So: shipped order → store converges to empty; read-back first → one
orphaned rat-ISO row survives. The second half is asserted too, so a
refactor that accidentally makes order irrelevant (or re-sequences the
deletes) turns this test red either way.
"""

from __future__ import annotations

import os
from datetime import date, datetime

from pyspark.sql import functions as F

from go_nonrat_annotation_pipeline_spark import schemas as S
from go_nonrat_annotation_pipeline_spark.pipeline.config import (
    CHINCHILLA,
    PipelineConfig,
)
from go_nonrat_annotation_pipeline_spark.pipeline.fixtures import (
    _annot_row,
    build_dims,
)
from go_nonrat_annotation_pipeline_spark.pipeline.run import (
    SpeciesJob,
    run_pipeline,
)
from go_nonrat_annotation_pipeline_spark.pipeline.sink import AnnotStore

CHIN_REF = 5555
OLD = datetime(2023, 1, 1, 0, 0, 0)
RUN_TS = datetime(2026, 6, 1, 12, 0, 0)


def _seed(spark, cfg):
    """A previous run's state: a pipeline-created direct GO annotation
    on chinchilla gene 401, and the rat-ISO twin the read-back derived
    from it. Both stale relative to RUN_TS."""
    rows = [
        # the source: direct annot on the chin gene; created_by=pipeline
        # (NOT 67/192, so the read-back re-projects it while it exists)
        _annot_row(
            full_annot_key=8001,
            term="apoptotic process",
            annotated_object_rgd_id=401,
            data_src="RGD",
            object_symbol="ChinA",
            ref_rgd_id=CHIN_REF,
            evidence="IDA",
            with_info="RGD:61958",
            aspect="P",
            object_name="chinchilla gene A",
            created_date=OLD,
            last_modified_date=OLD,
            term_acc="GO:0000001",
            created_by=cfg.created_by,
            last_modified_by=cfg.created_by,
        ),
        # the derived rat-ISO twin from the previous run
        _annot_row(
            full_annot_key=8002,
            term="apoptotic process",
            annotated_object_rgd_id=201,
            data_src="RGD",
            object_symbol="Pax6r",
            ref_rgd_id=cfg.iso_ref_rgd_id,
            evidence="ISO",
            with_info="RGD:401",
            aspect="P",
            object_name="rat paired box 6",
            created_date=OLD,
            last_modified_date=OLD,
            term_acc="GO:0000001",
            created_by=cfg.created_by,
            last_modified_by=cfg.created_by,
            original_created_date=date(2024, 4, 8),
        ),
    ]
    return spark.createDataFrame(
        [tuple(r[f.name] for f in S.FULL_ANNOT_SCHEMA.fields) for r in rows],
        S.FULL_ANNOT_SCHEMA,
    )


def _empty_gaf(root) -> str:
    path = os.path.join(str(root), "chin_empty.gaf")
    with open(path, "w") as fh:
        fh.write("!gaf-version: 2.2\n")  # feed dropped the annotation
    return path


def _run(spark, tmp_path, name, jobs_order):
    # 100% threshold: this scenario legitimately deletes every row of
    # each ref — the 10% production guard would abort (that guard has
    # its own test, test_pipeline.test_threshold_abort)
    cfg = PipelineConfig(stale_annot_delete_threshold="100%")
    dims = build_dims(spark)
    store = AnnotStore(spark, os.path.join(str(tmp_path), name))
    store.seed(_seed(spark, cfg))
    gaf = _empty_gaf(tmp_path)
    producer = SpeciesJob(CHINCHILLA, CHIN_REF, ("RGD",), [gaf])
    readback = SpeciesJob(CHINCHILLA, 0, None, None)
    jobs = (
        [producer, readback] if jobs_order == "shipped"
        else [readback, producer]
    )
    report = run_pipeline(spark, cfg, dims, store, jobs, run_ts=RUN_TS)
    fa = store.read()
    return (
        report,
        fa.where(F.col("ref_rgd_id") == CHIN_REF).count(),
        fa.where(F.col("ref_rgd_id") == cfg.iso_ref_rgd_id).count(),
    )


def test_shipped_order_cascades_source_removal_in_one_run(spark, tmp_path):
    report, n_direct, n_iso = _run(spark, tmp_path, "shipped", "shipped")
    assert n_direct == 0          # producer's stale delete removed the source
    assert n_iso == 0             # ...so the final rat-ISO delete removed the twin
    assert report.iso_stale_deleted == 1
    assert report.species[0].stale_deleted == 1  # the producer job


def test_readback_first_leaves_an_orphaned_rat_iso(spark, tmp_path):
    """The failure mode the shipped sequencing prevents — asserted so a
    reordering refactor flips the OTHER test red instead of passing
    vacuously."""
    report, n_direct, n_iso = _run(spark, tmp_path, "reordered", "reordered")
    assert n_direct == 0          # the source row still gets deleted...
    assert n_iso == 1             # ...but its re-derived rat-ISO twin survives
