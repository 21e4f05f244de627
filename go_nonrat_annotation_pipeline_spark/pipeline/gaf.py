"""GAF ingest layer: scan, normalize, split (SURVEY.md §2.1 S3-S5, §2.2 P1-P5).

Reference behavior: MAHParser.java:41-83 (line scan, comment skip,
``MGI:MGI:``→``MGI:`` normalization, tab split with trailing empties,
source-DB filter, per-source line counts), GoaFileSplitter.java:17-71
(taxon pre-filter), AllSpeciesFileSplitter.java:75-142 (split-by-species
sink).

Spark-first: one schema-based CSV scan (Spark decompresses ``.gz``
transparently and Catalyst pushes the source/taxon filters into it);
the split-by-species demultiplexer is ``write.partitionBy`` — a single
shuffle-free pass instead of the reference's manual writer map.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schemas import GAF_COLUMNS, GAF_SCHEMA


def read_gaf(spark: SparkSession, paths: list[str] | str) -> DataFrame:
    """S3 + P1-P3: scan GAF 2.x TSV (optionally gzipped), drop ``!``
    comments, normalize ``MGI:MGI:`` double prefixes (MAHParser.java:50).

    GAF 1.0 15-column rows parse with trailing nulls (the reference
    tolerates them via length checks, MAHQC.java:232-242).
    """
    df = (
        spark.read.option("sep", "\t")
        .option("comment", "!")
        .option("mode", "PERMISSIVE")
        .schema(GAF_SCHEMA)
        .csv(paths)
    )
    # the reference normalizes the whole raw line before splitting; the
    # double prefix only ever occurs in ID-bearing columns
    for c in ("db_object_id", "db_reference", "with_from", "gene_product_form_id"):
        df = df.withColumn(c, F.regexp_replace(c, "MGI:MGI:", "MGI:"))
    return df


def source_line_counts(df: DataFrame) -> DataFrame:
    """A1: per-source line counts over ALL non-comment lines
    (MAHParser.java:55-62) — computed before the source filter."""
    return df.groupBy("db").agg(F.count("*").alias("line_count"))


def filter_sources(df: DataFrame, sources: list[str] | tuple[str, ...]) -> DataFrame:
    """P4: keep rows whose source DB is configured (MAHParser.java:65-67)."""
    return df.where(F.col("db").isin(list(sources)))


def with_taxon_id(df: DataFrame) -> DataFrame:
    """P5: extract the leading NCBI taxon id from ``taxon:NNNN[|...]``
    (GoaFileSplitter.java:47-58)."""
    return df.withColumn(
        "taxon_id", F.regexp_extract("taxon", r"taxon:(\d+)", 1).cast("int")
    )


def filter_allowed_taxa(df: DataFrame, species: DataFrame) -> DataFrame:
    """S4: taxon pre-filter against the species dimension
    (GoaFileSplitter.java:60-64) — a broadcast semi-join the CSV scan
    can't see, but ~1000× selective before any downstream shuffle."""
    allowed = species.select(F.col("taxonomic_id").alias("taxon_id"))
    return with_taxon_id(df).join(F.broadcast(allowed), "taxon_id", "left_semi")


def split_by_species(
    df: DataFrame, species: DataFrame, out_dir: str
) -> None:
    """S5: demultiplex one GAF into per-species partitions
    (AllSpeciesFileSplitter.java:75-142). One shuffle-free pass; the
    reference's "skip if output exists" memoization becomes idempotent
    overwrite, and downstream per-species reads get partition pruning."""
    keyed = with_taxon_id(df).join(
        F.broadcast(
            species.select(
                F.col("taxonomic_id").alias("taxon_id"), "species_type_key"
            )
        ),
        "taxon_id",
        "inner",
    )
    (
        keyed.select(*GAF_COLUMNS, "species_type_key")
        .write.mode("overwrite")
        .partitionBy("species_type_key")
        .parquet(out_dir)
    )
