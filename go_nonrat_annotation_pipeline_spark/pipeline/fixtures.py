"""Deterministic test fixtures (FIXTURES.md) for the pipeline parity tests.

Covers every QC branch: double MGI prefix, UniProt secondary-key and
alt-id fallbacks, retired-gene history resolution, wrong species,
high-level (Not4Curation) terms, IPI × catalytic-activity descendants,
missing GO terms, ISO evidence gating, no-rat-ortholog genes, A3/A4
merge groups, and seeded FULL_ANNOT rows for the touch / update /
stale-delete / chinchilla read-back paths.
"""

from __future__ import annotations

import os
from datetime import date, datetime

from pyspark.sql import DataFrame, SparkSession

from .. import schemas as S
from .config import PipelineConfig
from .qc import Dims

MGI_REF = 2290270
ISO_REF = 1624291


def build_dims(spark: SparkSession) -> Dims:
    species = spark.createDataFrame(
        [
            (1, "human", "HUMAN", 9606, True),
            (2, "mouse", "MOUSE", 10090, True),
            (3, "rat", "RAT", 10116, True),
            (4, "chinchilla", "CHINCHILLA", 34839, True),
        ],
        S.SPECIES_SCHEMA,
    )
    genes = spark.createDataFrame(
        [
            (101, "Pax6", "paired box 6", "protein-coding", 2),
            (102, "OldGene", "retired mouse gene", "protein-coding", 2),
            (103, "NewGene", "successor mouse gene", "protein-coding", 2),
            (104, "Lonely", "no rat ortholog", "protein-coding", 2),
            (201, "Pax6r", "rat paired box 6", "protein-coding", 3),
            (202, "Newr", "rat successor ortholog", "protein-coding", 3),
            (203, "Deadr", "retired rat gene", "protein-coding", 3),
            (301, "HUMG", "a human gene", "protein-coding", 1),
            (401, "ChinA", "chinchilla gene A", "protein-coding", 4),
        ],
        S.GENES_SCHEMA,
    )
    rgd_ids = spark.createDataFrame(
        [
            (101, 1, "ACTIVE", 2),
            (102, 1, "RETIRED", 2),
            (103, 1, "ACTIVE", 2),
            (104, 1, "ACTIVE", 2),
            (201, 1, "ACTIVE", 3),
            (202, 1, "ACTIVE", 3),
            (203, 1, "RETIRED", 3),
            (301, 1, "ACTIVE", 1),
            (401, 1, "ACTIVE", 4),
        ],
        S.RGD_IDS_SCHEMA,
    )
    rgd_acc_xdb = spark.createDataFrame(
        [
            (1, 101, 5, "MGI:97490"),
            (2, 102, 5, "MGI:RETIRED1"),
            (3, 104, 14, "P12345"),
            (4, 101, 60, "Q99999"),       # UniProt secondary key
            (5, 104, 14, "ALT1"),         # matched via gene_product_form_id
            (6, 301, 5, "MGI:HUMANG"),    # wrong-species match
            (7, 101, 68, "URS0001"),      # RNAcentral acc (species-scoped)
        ],
        S.RGD_ACC_XDB_SCHEMA,
    )
    ortholog_edges = spark.createDataFrame(
        [(101, 201), (103, 202), (104, 203), (401, 201)],
        S.ORTHOLOG_EDGES_SCHEMA,
    )
    ont_terms = spark.createDataFrame(
        [
            ("GO:0000001", "apoptotic process", 0, "GO"),
            ("GO:0000002", "binding", 0, "GO"),
            ("GO:0008150", "biological_process", 0, "GO"),
            ("GO:0003824", "catalytic activity", 0, "GO"),
            ("GO:0016301", "kinase activity", 0, "GO"),
        ],
        S.ONT_TERMS_SCHEMA,
    )
    ont_synonyms = spark.createDataFrame(
        [("GO:0008150", "Not4Curation")], S.ONT_SYNONYMS_SCHEMA
    )
    ont_dag = spark.createDataFrame(
        [("GO:0016301", "GO:0003824")], S.ONT_DAG_SCHEMA
    )
    rgd_id_history = spark.createDataFrame(
        [(102, 103), (105, 105), (106, 203)], S.RGD_ID_HISTORY_SCHEMA
    )
    return Dims(
        genes=genes,
        rgd_ids=rgd_ids,
        rgd_acc_xdb=rgd_acc_xdb,
        ortholog_edges=ortholog_edges,
        ont_terms=ont_terms,
        ont_synonyms=ont_synonyms,
        ont_dag=ont_dag,
        rgd_id_history=rgd_id_history,
        species=species,
    )


MOUSE_GAF_LINES = [
    "!gaf-version: 2.2",
    # direct IDA annot on 101 (+ rat ISO on 201); double MGI prefix
    "MGI\tMGI:MGI:97490\tPax6\t\tGO:0000001\tPMID:111|MGI:MGI:222\tIDA\t\tP\tpaired box 6\tPax-6\tgene\ttaxon:10090\t20240408\tMGI\t\t",
    # UniProt secondary-key match → 101; IEA (outside ISO gate)
    "UniProtKB\tQ99999\tPax6\t\tGO:0000002\tPMID:333\tIEA\t\tF\tpaired box 6\t\tprotein\ttaxon:10090\t20240408\tUniProtKB\t\t",
    # alt-id fallback via gene_product_form_id → 104 (no rat ortholog)
    "UniProtKB\tNOMATCH\tLonely\t\tGO:0000002\tPMID:777\tIDA\t\tF\tno rat ortholog\t\tprotein\ttaxon:10090\t20240408\tUniProtKB\t\tUniProtKB:ALT1",
    # retired gene → history chain 102→103; IMP → ISO on 202
    "MGI\tMGI:RETIRED1\tOldGene\t\tGO:0000001\tPMID:555\tIMP\t\tP\tretired mouse gene\t\tgene\ttaxon:10090\t20240408\tMGI\t\t",
    # high-level Not4Curation term → skipped
    "MGI\tMGI:97490\tPax6\t\tGO:0008150\tPMID:888\tIDA\t\tP\tpaired box 6\t\tgene\ttaxon:10090\t20240408\tMGI\t\t",
    # IPI × catalytic-activity descendant → skipped
    "UniProtKB\tQ99999\tPax6\t\tGO:0016301\tPMID:999\tIPI\t\tF\tpaired box 6\t\tprotein\ttaxon:10090\t20240408\tUniProtKB\t\t",
    # GO term absent from ont_terms → dropped with audit
    "MGI\tMGI:97490\tPax6\t\tGO:0099999\tPMID:123\tIDA\t\tP\tpaired box 6\t\tgene\ttaxon:10090\t20240408\tMGI\t\t",
    # wrong species (human gene in mouse file) → guarded out
    "MGI\tMGI:HUMANG\tHUMG\t\tGO:0000001\tPMID:444\tIDA\t\tP\ta human gene\t\tgene\ttaxon:9606\t20240408\tMGI\t\t",
    # RNAcentral row — excluded by the mouse source filter (counted in A1)
    "RNAcentral\tURS0001_10090\tmiR-1\t\tGO:0000002\tPMID:321\tIDA\t\tF\tmicroRNA 1\t\tmiRNA\ttaxon:10090\t20240408\tRNAcentral\t\t",
    # duplicate of the first annot with different reference → A4 merge
    "MGI\tMGI:97490\tPax6\t\tGO:0000001\tPMID:444\tIDA\t\tP\tpaired box 6\tPax-6\tgene\ttaxon:10090\t20240408\tMGI\t\t",
    # A3 pair: identical but for WITH_INFO (IGI → also ISO-gated)
    "MGI\tMGI:97490\tPax6\t\tGO:0000002\tPMID:600\tIGI\tMGI:W1|MGI:W2\tF\tpaired box 6\t\tgene\ttaxon:10090\t20240408\tMGI\t\t",
    "MGI\tMGI:97490\tPax6\t\tGO:0000002\tPMID:600\tIGI\tMGI:W2|MGI:W3\tF\tpaired box 6\t\tgene\ttaxon:10090\t20240408\tMGI\t\t",
]


def write_mouse_gaf(path: str) -> str:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as fh:
        fh.write("\n".join(MOUSE_GAF_LINES) + "\n")
    return path


def _annot_row(**kw) -> dict:
    base = {f.name: None for f in S.FULL_ANNOT_SCHEMA.fields}
    base.update(rgd_object_key=1, evidence="IDA")
    base.update(kw)
    return base


def seed_full_annot(spark: SparkSession, cfg: PipelineConfig) -> DataFrame:
    """Seeded target rows: touch path, update path, stale row, manual
    chinchilla annot (read-back source)."""
    old = datetime(2023, 1, 1, 0, 0, 0)
    rows = [
        # touch path: exact 9-key + payload match of the incoming merged
        # UniProtKB IEA annot on gene 101
        _annot_row(
            full_annot_key=9001,
            term="binding",
            annotated_object_rgd_id=101,
            data_src="UniProt",
            object_symbol="Pax6",
            ref_rgd_id=MGI_REF,
            evidence="IEA",
            aspect="F",
            object_name="paired box 6",
            notes="  (PMID:333)",
            created_date=old,
            last_modified_date=old,
            term_acc="GO:0000002",
            created_by=cfg.created_by,
            last_modified_by=cfg.created_by,
            xref_source="PMID:333",
            original_created_date=date(2024, 4, 8),
        ),
        # update path: same 9-key as the incoming IMP annot on 103 but
        # stale ORIGINAL_CREATED_DATE + NOTES
        _annot_row(
            full_annot_key=9002,
            term="apoptotic process",
            annotated_object_rgd_id=103,
            data_src="MGI",
            object_symbol="NewGene",
            ref_rgd_id=MGI_REF,
            evidence="IMP",
            aspect="P",
            object_name="successor mouse gene",
            notes="old note",
            created_date=old,
            last_modified_date=old,
            term_acc="GO:0000001",
            created_by=cfg.created_by,
            last_modified_by=cfg.created_by,
            xref_source="PMID:555",
            original_created_date=date(2020, 1, 1),
        ),
        # stale pipeline-created row: no incoming match → delete candidate
        _annot_row(
            full_annot_key=9003,
            term="binding",
            annotated_object_rgd_id=101,
            data_src="MGI",
            object_symbol="Pax6",
            ref_rgd_id=MGI_REF,
            evidence="ND",
            aspect="F",
            object_name="paired box 6",
            created_date=old,
            last_modified_date=old,
            term_acc="GO:0000002",
            created_by=cfg.created_by,
            last_modified_by=cfg.created_by,
            xref_source="STALE:1",
        ),
        # manual chinchilla GO annot (created_by outside 67/192) —
        # the read-back source; derives a rat ISO annot on 201
        _annot_row(
            full_annot_key=9004,
            term="apoptotic process",
            annotated_object_rgd_id=401,
            data_src="RGD",
            object_symbol="ChinA",
            ref_rgd_id=7777,
            evidence="IDA",
            with_info="RGD:61958",
            aspect="P",
            object_name="chinchilla gene A",
            created_date=datetime(2024, 4, 8, 12, 0, 0),
            last_modified_date=old,
            term_acc="GO:0000001",
            created_by=50,
            last_modified_by=50,
        ),
    ]
    return spark.createDataFrame(
        [tuple(r[f.name] for f in S.FULL_ANNOT_SCHEMA.fields) for r in rows],
        S.FULL_ANNOT_SCHEMA,
    )
