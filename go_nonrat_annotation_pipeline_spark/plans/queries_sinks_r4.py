"""Round-4 sink/sketch additions: ORC round-trip and grouped HLL —
registered AFTER the round-4 correctness window (plans/registry.py);
verified by tools/compare.py locally this round, lead the round-5
rotation."""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators import sketches as SK
from ..sources.testdata import load_table
from .registry import register


@register(
    "q_orc_roundtrip",
    """
    SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           MIN(doc_id) AS min_doc, MAX(doc_id) AS max_doc
    FROM documents GROUP BY source
    """,
    doc="ORC sink→source round-trip is lossless (columnar alternative "
    "to parquet, native Spark writer/reader; oracle aggregates the "
    "original table — equality proves the round trip)",
)
def q_orc_roundtrip(spark, sf_dir):
    import os
    import tempfile

    docs = load_table(spark, sf_dir, "documents")
    path = os.path.join(tempfile.mkdtemp(prefix="orc_rt_"), "docs")
    docs.write.mode("overwrite").orc(path)
    back = spark.read.orc(path)
    return back.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").cast("long").alias("total_chars"),
        F.min("doc_id").alias("min_doc"),
        F.max("doc_id").alias("max_doc"),
    )


@register(
    "q_hll_by_group",
    f"""
    WITH mapped AS (
      SELECT event_type,
             {SK.sql_hash60("CAST(user_id AS VARCHAR)")} % 64 AS register,
             CASE WHEN {SK.sql_hash60("CAST(user_id AS VARCHAR)")} // 64 = 0
                  THEN 55
                  ELSE 55 - LENGTH(LTRIM(BIN(
                      {SK.sql_hash60("CAST(user_id AS VARCHAR)")} // 64), '0'))
             END AS rho
      FROM events
    )
    SELECT event_type, register, MAX(rho) AS max_rho
    FROM mapped GROUP BY event_type, register
    """,
    doc="grouped HLL: per-event_type register tables in ONE aggregate — "
    "the per-segment distinct-user rollup (state = groups × 64 rows, "
    "mergeable across days by register-wise MAX)",
)
def q_hll_by_group(spark, sf_dir):
    events = load_table(spark, sf_dir, "events")
    h = SK.hash60(F.col("user_id").cast("string"))
    w = F.shiftright(h, 6)
    rho = F.when(w == 0, F.lit(SK.HASH_BITS - 6 + 1)).otherwise(
        F.lit(SK.HASH_BITS - 6 + 1) - F.length(F.bin(w))
    )
    return (
        events.select(
            "event_type", (h % 64).alias("register"), rho.alias("rho")
        )
        .groupBy("event_type", "register")
        .agg(F.max("rho").alias("max_rho"))
    )
