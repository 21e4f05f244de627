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

from pyspark.sql import functions as F

from ..pipeline.config import MOUSE, PipelineConfig
from ..pipeline.consolidate import consolidate_with_info, merge_duplicates
from ..pipeline.fixtures import MGI_REF, build_dims, write_mouse_gaf
from ..pipeline.gaf import filter_sources, read_gaf
from ..pipeline.qc import derive_annotations
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
