"""End-to-end pipeline query: the reference-parity dataflow (GAF scan →
QC joins → A3/A4 consolidation) on the deterministic fixture set, hash-
checked against a hand-computed golden VALUES oracle.

This is the §3.3 five-stage spine as ONE Catalyst-compiled DAG — the
same code path the golden E2E tests drive, surfaced to the driver's
DuckDB gate. (The mutable-sink stages A7/A8 are exercised by
tests/test_pipeline.py; their classification logic is separately
oracle-checked by a7/a8 on the synthetic tables.)
"""

from __future__ import annotations

import os
import tempfile
from datetime import datetime

from pyspark.sql import functions as F

from ..pipeline.config import CHINCHILLA, MOUSE, PipelineConfig
from ..pipeline.consolidate import consolidate_with_info, merge_duplicates
from ..pipeline.fixtures import (
    MGI_REF,
    build_dims,
    seed_full_annot,
    write_mouse_gaf,
)
from ..pipeline.gaf import filter_sources, read_gaf
from ..pipeline.qc import derive_annotations
from ..pipeline.run import SpeciesJob, run_pipeline
from ..pipeline.sink import AnnotStore
from .registry import register

_GOLDEN = [
    ("GO:0000001", 101, "IDA", 2290270, None, "MGI:222|PMID:111|PMID:444",
     "  (PMID:111|MGI:222), (PMID:444)", "MGI", "Pax6"),
    ("GO:0000001", 103, "IMP", 2290270, None, "PMID:555", "  (PMID:555)",
     "MGI", "NewGene"),
    ("GO:0000001", 201, "ISO", 1624291, "RGD:101", "MGI:222|PMID:111|PMID:444",
     "  (PMID:111|MGI:222), (PMID:444)", "RGD", "Pax6r"),
    ("GO:0000001", 202, "ISO", 1624291, "RGD:103", "PMID:555", "  (PMID:555)",
     "RGD", "Newr"),
    ("GO:0000002", 101, "IEA", 2290270, None, "PMID:333", "  (PMID:333)",
     "UniProt", "Pax6"),
    ("GO:0000002", 101, "IGI", 2290270, "MGI:W1|MGI:W2|MGI:W3", "PMID:600",
     "  (PMID:600)", "MGI", "Pax6"),
    ("GO:0000002", 104, "IDA", 2290270, None, "PMID:777", "  (PMID:777)",
     "UniProt", "Lonely"),
    ("GO:0000002", 201, "ISO", 1624291, "RGD:101", "PMID:600",
     "MGI:W1|MGI:W2|MGI:W3  (PMID:600)", "RGD", "Pax6r"),
]


def _sql_lit(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, int):
        return str(v)
    return "'" + str(v).replace("'", "''") + "'"


_ORACLE = (
    "SELECT * FROM (VALUES\n"
    + ",\n".join("  (" + ", ".join(_sql_lit(v) for v in row) + ")" for row in _GOLDEN)
    + "\n) t(term_acc, annotated_object_rgd_id, evidence, ref_rgd_id, "
    "with_info, xref_source, notes, data_src, object_symbol)"
)


@register(
    "pipeline_e2e_mouse",
    _ORACLE,
    doc="E2E: GAF scan → QC joins → A3/A4 consolidation vs golden VALUES",
)
def pipeline_e2e_mouse(spark, sf_dir):
    cfg = PipelineConfig()
    dims = build_dims(spark)
    gaf_path = write_mouse_gaf(
        os.path.join(tempfile.mkdtemp(prefix="gaf_e2e_"), "mgi.gaf")
    )
    gaf = filter_sources(read_gaf(spark, [gaf_path]), cfg.mouse_sources)
    qc = derive_annotations(spark, gaf, dims, cfg, MOUSE, MGI_REF)
    out = merge_duplicates(consolidate_with_info(qc.annots))
    return out.select(
        "term_acc",
        F.col("annotated_object_rgd_id").cast("int").alias("annotated_object_rgd_id"),
        "evidence",
        F.col("ref_rgd_id").cast("int").alias("ref_rgd_id"),
        "with_info",
        "xref_source",
        "notes",
        "data_src",
        "object_symbol",
    )


# ---------------------------------------------------------------------------
# E2E through the MUTABLE STORE (A7/A8 + S7 read-back as one run):
# seed FULL_ANNOT → mouse job (merge_upsert: 6 inserts / 1 update /
# 1 touch; stale delete: 1) → chinchilla read-back job (1 rat-ISO
# insert) → final table vs golden VALUES. Covers MAHDL.java:127-187 +
# DAO.java:169-226 end-to-end; timestamps are deterministic because
# run_ts is pinned.
# ---------------------------------------------------------------------------
_RUN_TS = datetime(2026, 6, 1, 12, 0, 0)
_TS = "2026-06-01 12:00:00"
_OLD = "2023-01-01 00:00:00"

# (term_acc, rgd_id, evidence, ref, with_info, xref, notes, data_src,
#  symbol, created_date, last_modified_date)
_GOLDEN_UPSERT = [
    # seeded survivors
    ("GO:0000002", 101, "IEA", 2290270, None, "PMID:333", "  (PMID:333)",
     "UniProt", "Pax6", _OLD, _TS),                      # 9001 touched
    ("GO:0000001", 103, "IMP", 2290270, None, "PMID:555", "  (PMID:555)",
     "MGI", "NewGene", _OLD, _TS),                       # 9002 updated (notes)
    ("GO:0000001", 401, "IDA", 7777, "RGD:61958", None, None,
     "RGD", "ChinA", "2024-04-08 12:00:00", _OLD),       # 9004 untouched
    # mouse-job inserts
    ("GO:0000001", 101, "IDA", 2290270, None, "MGI:222|PMID:111|PMID:444",
     "  (PMID:111|MGI:222), (PMID:444)", "MGI", "Pax6", _TS, _TS),
    ("GO:0000001", 201, "ISO", 1624291, "RGD:101", "MGI:222|PMID:111|PMID:444",
     "  (PMID:111|MGI:222), (PMID:444)", "RGD", "Pax6r", _TS, _TS),
    ("GO:0000001", 202, "ISO", 1624291, "RGD:103", "PMID:555", "  (PMID:555)",
     "RGD", "Newr", _TS, _TS),
    ("GO:0000002", 101, "IGI", 2290270, "MGI:W1|MGI:W2|MGI:W3", "PMID:600",
     "  (PMID:600)", "MGI", "Pax6", _TS, _TS),
    ("GO:0000002", 104, "IDA", 2290270, None, "PMID:777", "  (PMID:777)",
     "UniProt", "Lonely", _TS, _TS),
    ("GO:0000002", 201, "ISO", 1624291, "RGD:101", "PMID:600",
     "MGI:W1|MGI:W2|MGI:W3  (PMID:600)", "RGD", "Pax6r", _TS, _TS),
    # chinchilla read-back job: derived rat ISO on 201; the manual
    # annot's WITH_INFO (RGD:61958) lands in notes per the ISO
    # field-move rules (P12), with_info becomes the source gene
    ("GO:0000001", 201, "ISO", 1624291, "RGD:401", "RGD:7777",
     "RGD:61958", "RGD", "Pax6r", _TS, _TS),
]

_ORACLE_UPSERT = (
    "SELECT * FROM (VALUES\n"
    + ",\n".join(
        "  (" + ", ".join(_sql_lit(v) for v in row) + ")" for row in _GOLDEN_UPSERT
    )
    + "\n) t(term_acc, annotated_object_rgd_id, evidence, ref_rgd_id, "
    "with_info, xref_source, notes, data_src, object_symbol, "
    "created_date, last_modified_date)"
)


@register(
    "pipeline_e2e_upsert",
    _ORACLE_UPSERT,
    doc="E2E: seeded store → merge/upsert/stale-delete → final table vs golden",
)
def pipeline_e2e_upsert(spark, sf_dir):
    cfg = PipelineConfig()
    dims = build_dims(spark)
    root = tempfile.mkdtemp(prefix="e2e_upsert_")
    gaf_path = write_mouse_gaf(os.path.join(root, "mgi.gaf"))
    store = AnnotStore(spark, os.path.join(root, "full_annot"))
    store.seed(seed_full_annot(spark, cfg))
    jobs = [
        SpeciesJob(MOUSE, MGI_REF, cfg.mouse_sources, [gaf_path]),
        SpeciesJob(CHINCHILLA, 0, None, None),
    ]
    run_pipeline(spark, cfg, dims, store, jobs, run_ts=_RUN_TS)
    return store.read().select(
        "term_acc",
        F.col("annotated_object_rgd_id").cast("int").alias("annotated_object_rgd_id"),
        "evidence",
        F.col("ref_rgd_id").cast("int").alias("ref_rgd_id"),
        "with_info",
        "xref_source",
        "notes",
        "data_src",
        "object_symbol",
        F.date_format("created_date", "yyyy-MM-dd HH:mm:ss").alias("created_date"),
        F.date_format("last_modified_date", "yyyy-MM-dd HH:mm:ss").alias(
            "last_modified_date"
        ),
    )
