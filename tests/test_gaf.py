"""GAF ingest unit tests (S3/P1-P5): comment skip, MGI:MGI: prefix
normalization, GAF 1.0 15-column tolerance, taxon filter/split."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from go_nonrat_annotation_pipeline_spark.pipeline.fixtures import build_dims
from go_nonrat_annotation_pipeline_spark.pipeline.gaf import (
    filter_allowed_taxa,
    read_gaf,
    source_line_counts,
    split_by_species,
    with_taxon_id,
)

LINES = [
    "!gaf-version: 1.0",
    "! another comment",
    # 17-col row with double prefixes in id / reference / with
    "MGI\tMGI:MGI:1\tSym\t\tGO:1\tMGI:MGI:9|PMID:1\tIDA\tMGI:MGI:8\tP\tname\t\tgene\ttaxon:10090\t20240101\tMGI\t\tMGI:MGI:7",
    # GAF 1.0: only 15 columns — trailing two come back null
    "UniProtKB\tP1\tSym2\t\tGO:2\tPMID:2\tIEA\t\tF\tname2\t\tprotein\ttaxon:9606\t20240101\tUniProt",
    # unsupported taxon (filtered by allowed-taxa)
    "UniProtKB\tP2\tSym3\t\tGO:3\tPMID:3\tIEA\t\tF\tname3\t\tprotein\ttaxon:7227\t20240101\tUniProt",
]


def _write(tmp_path) -> str:
    p = os.path.join(str(tmp_path), "t.gaf")
    with open(p, "w") as fh:
        fh.write("\n".join(LINES) + "\n")
    return p


def test_read_gaf_normalization_and_gaf10(spark, tmp_path):
    df = read_gaf(spark, _write(tmp_path))
    rows = {r.db_object_id: r for r in df.collect()}
    assert len(rows) == 3  # comments skipped
    mgi = rows["MGI:1"]  # double prefix collapsed
    assert mgi.db_reference == "MGI:9|PMID:1"
    assert mgi.with_from == "MGI:8"
    assert mgi.gene_product_form_id == "MGI:7"
    # GAF 1.0 row: 15 cols parse, last two null
    g10 = rows["P1"]
    assert g10.annotation_extension is None
    assert g10.gene_product_form_id is None
    assert g10.assigned_by == "UniProt"


def test_counts_taxon_filter_split(spark, tmp_path):
    df = read_gaf(spark, _write(tmp_path))
    dims = build_dims(spark)

    counts = {r.db: r.line_count for r in source_line_counts(df).collect()}
    assert counts == {"MGI": 1, "UniProtKB": 2}

    assert with_taxon_id(df).where(F.col("taxon_id") == 7227).count() == 1
    kept = filter_allowed_taxa(df, dims.species)
    assert kept.count() == 2  # fruit fly 7227 is not a supported species

    out = os.path.join(str(tmp_path), "split")
    split_by_species(df, dims.species, out)
    back = spark.read.parquet(out)
    by_sp = {r.species_type_key: r["count"] for r in back.groupBy("species_type_key").count().collect()}
    assert by_sp == {1: 1, 2: 1}  # partition-pruned per-species layout
