"""Consolidation / grouped-merge queries (SURVEY.md §2.4 A3-A5).

These exercise the engine's duplicate-merge semantics: composite-key
grouping, set-union of delimited token fields, set-difference
(NOTES − XREF), PMID note reconstruction, and the length-bounded
fragment packer with multi-row emission — re-expressed over the
synthetic tables. The DuckDB oracles express the greedy packer as a
recursive CTE, so the kernel itself is hash-checked cross-engine.

Reference semantics: WithInfoConsolidator.java:23-143 (A3),
MAHDL.java:30-125 (A4), MAHDL.java:129-134 (A5).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..functions.packer import pack_fragments
from ..sources.testdata import load_table
from .registry import register

PACK_LEN = 32


# ---------------------------------------------------------------------------
# A3 — WITH_INFO consolidation: group → token set-union → sort/dedup →
# length-bounded fragment packing → one output row per fragment.
# ---------------------------------------------------------------------------
@register(
    "a3_withinfo_consolidate",
    f"""
    WITH RECURSIVE toks AS (
      SELECT grp, tok,
             ROW_NUMBER() OVER (PARTITION BY grp ORDER BY tok) AS rn
      FROM (SELECT DISTINCT l_orderkey AS grp,
                   'P' || CAST(l_partkey AS VARCHAR) AS tok
            FROM lineitem)
    ), pack AS (
      SELECT grp, rn, tok AS cur, 0 AS frag_idx
      FROM toks WHERE rn = 1
      UNION ALL
      SELECT t.grp, t.rn,
             CASE WHEN LENGTH(p.cur) + 1 + LENGTH(t.tok) <= {PACK_LEN}
                  THEN p.cur || '|' || t.tok ELSE t.tok END,
             CASE WHEN LENGTH(p.cur) + 1 + LENGTH(t.tok) <= {PACK_LEN}
                  THEN p.frag_idx ELSE p.frag_idx + 1 END
      FROM pack p JOIN toks t ON t.grp = p.grp AND t.rn = p.rn + 1
    )
    SELECT grp AS l_orderkey, frag_idx, cur AS with_info
    FROM (SELECT grp, frag_idx, cur,
                 ROW_NUMBER() OVER (PARTITION BY grp, frag_idx ORDER BY rn DESC) AS rr
          FROM pack)
    WHERE rr = 1
    """,
    doc="A3: token set-union + greedy ≤N-char fragment packing + explode",
)
def a3_withinfo_consolidate(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    toks = (
        li.select(
            F.col("l_orderkey"),
            F.concat(F.lit("P"), F.col("l_partkey").cast("string")).alias("tok"),
        )
        .groupBy("l_orderkey")
        .agg(F.array_sort(F.collect_set("tok")).alias("toks"))
    )
    packed = toks.select(
        "l_orderkey", pack_fragments(F.col("toks"), PACK_LEN, "|").alias("frags")
    )
    return packed.select(
        "l_orderkey", F.posexplode("frags").alias("frag_idx", "with_info")
    )


# ---------------------------------------------------------------------------
# A4 — duplicate-annotation merge: 6-field-key grouping with XREF set-union,
# NOTES = (notes ∪) − xref, and PMID-style "(<xref>)" note reconstruction.
# ---------------------------------------------------------------------------
@register(
    "a4_duplicate_merge",
    """
    WITH member AS (
      SELECT o_custkey, o_orderstatus,
             'X' || CAST(o_orderkey % 50 AS VARCHAR) AS xref_tok,
             'X' || CAST(o_orderkey % 70 AS VARCHAR) AS note_tok,
             CASE WHEN o_orderkey % 10 = 0
                  THEN '(X' || CAST(o_orderkey % 50 AS VARCHAR) || ')' END AS pmid_note
      FROM orders
    ), grouped AS (
      SELECT o_custkey, o_orderstatus,
             LIST_SORT(LIST_DISTINCT(LIST(xref_tok))) AS xrefs,
             LIST_SORT(LIST_DISTINCT(LIST(note_tok))) AS notes_all,
             COALESCE(LIST_SORT(LIST_DISTINCT(LIST(pmid_note) FILTER (pmid_note IS NOT NULL))), []) AS pmids
      FROM member GROUP BY o_custkey, o_orderstatus
    )
    SELECT o_custkey, o_orderstatus,
           COALESCE(ARRAY_TO_STRING(xrefs, '|'), '') AS xref_source,
           COALESCE(ARRAY_TO_STRING(LIST_CONCAT(
               LIST_FILTER(notes_all, t -> NOT LIST_CONTAINS(xrefs, t)), pmids), ','), '') AS notes
    FROM grouped
    """,
    doc="A4: set-union merge, NOTES−XREF difference, PMID reconstruction",
)
def a4_duplicate_merge(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    member = orders.select(
        "o_custkey",
        "o_orderstatus",
        F.concat(F.lit("X"), (F.col("o_orderkey") % 50).cast("string")).alias("xref_tok"),
        F.concat(F.lit("X"), (F.col("o_orderkey") % 70).cast("string")).alias("note_tok"),
        F.when(
            F.col("o_orderkey") % 10 == 0,
            F.concat(F.lit("(X"), (F.col("o_orderkey") % 50).cast("string"), F.lit(")")),
        ).alias("pmid_note"),
    )
    grouped = member.groupBy("o_custkey", "o_orderstatus").agg(
        F.array_sort(F.collect_set("xref_tok")).alias("xrefs"),
        F.array_sort(F.collect_set("note_tok")).alias("notes_all"),
        F.array_sort(F.collect_set("pmid_note")).alias("pmids"),
    )
    # array_except dedups and preserves left (sorted) order — matches the
    # oracle's LIST_FILTER over sorted lists.
    return grouped.select(
        "o_custkey",
        "o_orderstatus",
        F.concat_ws("|", F.col("xrefs")).alias("xref_source"),
        F.concat_ws(
            ",", F.concat(F.array_except("notes_all", "xrefs"), F.col("pmids"))
        ).alias("notes"),
    )


# ---------------------------------------------------------------------------
# A5 — post-merge NOTES==XREF clear (NULL the redundant copy)
# ---------------------------------------------------------------------------
@register(
    "a5_notes_eq_xref_clear",
    """
    SELECT o_orderkey,
           o_orderpriority AS xref_source,
           CASE WHEN o_orderpriority = o_orderpriority THEN NULL END AS notes_cleared,
           NULLIF(o_orderstatus, o_orderpriority) AS notes_kept
    FROM orders
    """,
    doc="A5: clear NOTES when identical to XREF_SOURCE",
)
def a5_notes_eq_xref_clear(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        F.col("o_orderpriority").alias("xref_source"),
        F.when(F.col("o_orderpriority") == F.col("o_orderpriority"), F.lit(None))
        .cast("string")
        .alias("notes_cleared"),
        F.nullif(F.col("o_orderstatus"), F.col("o_orderpriority")).alias("notes_kept"),
    )
