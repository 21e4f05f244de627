"""Fixed StructType schemas for every table the engine touches.

Production paths never use schema inference (SURVEY.md §1.3). Column names
and semantics derive from the reference's GAF parsing
(reference: src/main/java/edu/mcw/rgd/MAHParser.java:33-122) and the
FULL_ANNOT DDL embedded in its rgdcore library (SURVEY.md §1.1/§1.3).
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# GAF 2.x — 17 positional columns, tab-separated, '!'-prefixed comments.
# Layout per reference MAHParser.java:94-114 / MAHQC.java:62-344.
# ---------------------------------------------------------------------------
GAF_COLUMNS = [
    "db",                   # 0  source database (MGI / UniProtKB / RNAcentral)
    "db_object_id",         # 1  gene/protein accession — the match key
    "db_object_symbol",     # 2
    "qualifier",            # 3
    "go_id",                # 4  term accession (term_acc)
    "db_reference",         # 5  -> xref_source / notes
    "evidence_code",        # 6
    "with_from",            # 7  -> with_info
    "aspect",               # 8  P/F/C
    "db_object_name",       # 9
    "db_object_synonym",    # 10 (unused by pipeline)
    "db_object_type",       # 11 (unused by pipeline)
    "taxon",                # 12 "taxon:NNNN[|taxon:MMMM]"
    "date",                 # 13 yyyyMMdd
    "assigned_by",          # 14 -> data_src (after substitution map)
    "annotation_extension", # 15
    "gene_product_form_id", # 16
]

GAF_SCHEMA = T.StructType(
    [T.StructField(c, T.StringType(), True) for c in GAF_COLUMNS]
)

# ---------------------------------------------------------------------------
# Dimension tables (FIXTURES.md §2; reference DAO.java / rgdcore SQL)
# ---------------------------------------------------------------------------
RGD_IDS_SCHEMA = T.StructType([
    T.StructField("rgd_id", T.IntegerType(), False),
    T.StructField("object_key", T.IntegerType(), True),       # genes = 1
    T.StructField("object_status", T.StringType(), True),     # ACTIVE/RETIRED/WITHDRAWN
    T.StructField("species_type_key", T.IntegerType(), True),
])

GENES_SCHEMA = T.StructType([
    T.StructField("rgd_id", T.IntegerType(), False),
    T.StructField("gene_symbol", T.StringType(), True),
    T.StructField("full_name", T.StringType(), True),
    T.StructField("gene_type_lc", T.StringType(), True),
    T.StructField("species_type_key", T.IntegerType(), True),
])

RGD_ACC_XDB_SCHEMA = T.StructType([
    T.StructField("acc_xdb_key", T.IntegerType(), True),
    T.StructField("rgd_id", T.IntegerType(), False),
    T.StructField("xdb_key", T.IntegerType(), False),
    T.StructField("acc_id", T.StringType(), False),
])

ORTHOLOG_EDGES_SCHEMA = T.StructType([
    T.StructField("src_rgd_id", T.IntegerType(), False),
    T.StructField("dest_rgd_id", T.IntegerType(), False),
])

ONT_TERMS_SCHEMA = T.StructType([
    T.StructField("term_acc", T.StringType(), False),
    T.StructField("term", T.StringType(), False),
    T.StructField("is_obsolete", T.IntegerType(), True),
    T.StructField("ont_id", T.StringType(), True),
])

ONT_SYNONYMS_SCHEMA = T.StructType([
    T.StructField("term_acc", T.StringType(), False),
    T.StructField("synonym_name", T.StringType(), False),
])

ONT_DAG_SCHEMA = T.StructType([
    T.StructField("child_term_acc", T.StringType(), False),
    T.StructField("parent_term_acc", T.StringType(), False),
])

RGD_ID_HISTORY_SCHEMA = T.StructType([
    T.StructField("old_rgd_id", T.IntegerType(), False),
    T.StructField("new_rgd_id", T.IntegerType(), False),
])

SPECIES_SCHEMA = T.StructType([
    T.StructField("species_type_key", T.IntegerType(), False),
    T.StructField("common_name", T.StringType(), True),
    T.StructField("short_name", T.StringType(), True),
    T.StructField("taxonomic_id", T.IntegerType(), False),
    T.StructField("is_searchable", T.BooleanType(), True),
])

# ---------------------------------------------------------------------------
# FULL_ANNOT — target/mutable table (FIXTURES.md §3; rgdcore insert columns)
# ---------------------------------------------------------------------------
FULL_ANNOT_SCHEMA = T.StructType([
    T.StructField("full_annot_key", T.LongType(), False),
    T.StructField("term", T.StringType(), True),
    T.StructField("annotated_object_rgd_id", T.IntegerType(), False),
    T.StructField("rgd_object_key", T.IntegerType(), True),
    T.StructField("data_src", T.StringType(), True),
    T.StructField("object_symbol", T.StringType(), True),
    T.StructField("ref_rgd_id", T.IntegerType(), True),
    T.StructField("evidence", T.StringType(), False),
    T.StructField("with_info", T.StringType(), True),
    T.StructField("aspect", T.StringType(), True),
    T.StructField("object_name", T.StringType(), True),
    T.StructField("notes", T.StringType(), True),
    T.StructField("qualifier", T.StringType(), True),
    T.StructField("created_date", T.TimestampType(), True),
    T.StructField("last_modified_date", T.TimestampType(), True),
    T.StructField("term_acc", T.StringType(), False),
    T.StructField("created_by", T.IntegerType(), True),
    T.StructField("last_modified_by", T.IntegerType(), True),
    T.StructField("xref_source", T.StringType(), True),
    T.StructField("annotation_extension", T.StringType(), True),
    T.StructField("gene_product_form_id", T.StringType(), True),
    T.StructField("original_created_date", T.DateType(), True),
    T.StructField("qualifier2", T.StringType(), True),
    T.StructField("associated_with", T.StringType(), True),
    T.StructField("molecular_entity", T.StringType(), True),
    T.StructField("alteration", T.StringType(), True),
    T.StructField("alteration_location", T.StringType(), True),
    T.StructField("variant_nomenclature", T.StringType(), True),
])

# The 9-field null-safe natural key used for annotation matching / upsert
# (reference MAHDL.java:137, DAO.java:154-157; SURVEY.md §2.3 J11).
ANNOT_MATCH_KEY = [
    "term_acc",
    "annotated_object_rgd_id",
    "evidence",
    "ref_rgd_id",
    "with_info",
    "qualifier",
    "xref_source",
    "qualifier2",
    "associated_with",
]

# 8-field WITH_INFO consolidation key (WithInfoConsolidator.java:23-36; A3)
WITHINFO_GROUP_KEY = [
    "term_acc",
    "annotated_object_rgd_id",
    "ref_rgd_id",
    "evidence",
    "qualifier",
    "xref_source",
    "data_src",
    "notes",
]

# 6-field duplicate-merge key (MAHDL.java:46-55; A4)
DUP_MERGE_KEY = [
    "term_acc",
    "annotated_object_rgd_id",
    "ref_rgd_id",
    "evidence",
    "qualifier",
    "with_info",
]

# Length bounds driving overflow splitting (Oracle VARCHAR limits;
# reference MAHDL.java:89 / WithInfoConsolidator.java:11)
XREF_SOURCE_MAX_LEN = 4000
WITH_INFO_MAX_LEN = 1700

# TPC-H-ish synthetic tables the driver harness provides (TESTDATA.md)
TESTDATA_TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]
