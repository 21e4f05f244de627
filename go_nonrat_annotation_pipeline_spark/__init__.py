"""PySpark-native analytics engine with the query and data-processing
capabilities of rat-genome-database/go-nonrat-annotation-pipeline.

A brand-new Spark-first design (DataFrame/SQL + Catalyst), NOT a port of the
reference's record-at-a-time Java architecture. See SURVEY.md for the
operator inventory this package implements, with reference citations in each
module's docstrings.

Layout:
  session        SparkSession factory tuned for local[N] and cluster use
  schemas        fixed StructTypes (GAF 2.x, FULL_ANNOT, dimension tables)
  config         pipeline configuration (mirrors reference AppConfigure.xml)
  sources/       scans & sinks (GAF text, parquet dims, partitioned writers)
  functions/     column-level transforms (normalize, fragment packer, text,
                 vector math) — built-in pyspark.sql.functions first
  operators/     relational operators (match joins, closures, consolidation,
                 merge/upsert, dedup, similarity)
  plans/         end-to-end pipeline orchestration + counter reporting
  streaming/     Structured Streaming wrappers (incremental pipeline)
"""

__version__ = "0.1.0"
