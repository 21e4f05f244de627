"""Relational core queries — scans, projections, joins, simple aggregates.

Each query demonstrates one operator row from SURVEY.md §2 (id in the
entry name) re-expressed over the driver's synthetic tables. The GAF
pipeline library applies the same operators to annotation data; these
registry entries exist so the DuckDB oracle can hash-check the operator
semantics at sf0.01.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..sources.testdata import load_table
from .registry import register

DEC = "decimal(18,6)"
DEC2 = "decimal(18,2)"


# ---------------------------------------------------------------------------
# Flagship: TPC-H Q1-style pricing summary (hash aggregate, decimal-exact).
# Exercises the scan→filter→project→groupBy-agg spine (SURVEY §7.2).
# ---------------------------------------------------------------------------
@register(
    "q1_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    doc="flagship scan→filter→groupBy→agg (A-family hash aggregate)",
)
def q1_pricing_summary(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            # accumulate exactly in decimal at the data's true scale (2dp);
            # keeping the unscaled sum < 2^53 makes the final decimal→double
            # cast a single correctly-rounded IEEE division, so both engines
            # produce bit-identical doubles for the hash check
            F.sum(F.col("l_quantity").cast(DEC2)).cast("double").alias("sum_qty"),
            F.sum(F.col("l_extendedprice").cast(DEC2))
            .cast("double")
            .alias("sum_base_price"),
            F.sum(
                F.col("l_extendedprice").cast(DEC2)
                * (F.lit(1) - F.col("l_discount").cast(DEC2))
            )
            .cast("double")
            .alias("sum_disc_price"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# ---------------------------------------------------------------------------
# S3 — projection + filter pushed to the parquet scan
# (reference GAF text scan MAHParser.java:41-75; here: columnar scan with
#  Catalyst pushdown — .explain shows PushedFilters + pruned ReadSchema)
# ---------------------------------------------------------------------------
@register(
    "s3_scan_project_filter",
    """
    SELECT l_orderkey, l_partkey, l_extendedprice
    FROM lineitem
    WHERE l_returnflag = 'R' AND l_quantity >= 45
    """,
    doc="S3: scan with projection/filter pushdown",
)
def s3_scan_project_filter(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    return li.where((F.col("l_returnflag") == "R") & (F.col("l_quantity") >= 45)).select(
        "l_orderkey", "l_partkey", "l_extendedprice"
    )


# ---------------------------------------------------------------------------
# S4 — pre-filter scan on a membership set (taxon pre-filter,
# GoaFileSplitter.java:17-71): predicate applied at the scan.
# ---------------------------------------------------------------------------
@register(
    "s4_prefilter_scan",
    """
    SELECT event_id, user_id, event_type, value
    FROM events
    WHERE event_type IN ('purchase', 'signup')
    """,
    doc="S4: isin membership pre-filter at scan",
)
def s4_prefilter_scan(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    return ev.where(F.col("event_type").isin("purchase", "signup")).select(
        "event_id", "user_id", "event_type", "value"
    )


# ---------------------------------------------------------------------------
# S5 — split-by-key demultiplexing (AllSpeciesFileSplitter.java:75-142).
# The sink itself (write.partitionBy) is covered in tests/test_sources.py;
# here the oracle checks the per-key demux cardinalities.
# ---------------------------------------------------------------------------
@register(
    "s5_split_by_key_counts",
    """
    SELECT lang, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM documents GROUP BY lang
    """,
    doc="S5: partition-key demux cardinalities",
)
def s5_split_by_key_counts(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return docs.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("n_chars").alias("total_chars")
    )


# ---------------------------------------------------------------------------
# S6 — dimension scan + broadcast join (DAO.java per-key caches → broadcast)
# ---------------------------------------------------------------------------
@register(
    "s6_dim_broadcast_join",
    """
    SELECT n.n_nationkey, n.n_name, r.r_name AS region_name
    FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
    """,
    doc="S6: small-dim broadcast hash join",
)
def s6_dim_broadcast_join(spark, sf_dir):
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    return (
        nation.join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select("n_nationkey", "n_name", F.col("r_name").alias("region_name"))
    )


# ---------------------------------------------------------------------------
# S7/P16 — source re-scan with semi-join + re-projection (the chinchilla
# read-back path: DAO.java:260-268 + MAHParser.java:85-122): filter the
# mutable table, EXISTS against active entities, re-project to a fixed
# column layout with renamed/derived columns.
# ---------------------------------------------------------------------------
@register(
    "s7_readback_reprojection",
    """
    SELECT 'ORD' AS db,
           'ORD:' || CAST(o.o_orderkey AS VARCHAR) AS db_object_id,
           o.o_orderpriority AS qualifier,
           CAST(o.o_custkey AS BIGINT) AS object_key,
           STRFTIME(o.o_orderdate, '%Y%m%d') AS date_str
    FROM orders o
    WHERE o.o_orderstatus = 'O'
      AND o.o_orderpriority NOT IN ('4-NOT SPECIFIED', '5-LOW')
      AND EXISTS (SELECT 1 FROM customer c
                  WHERE c.c_custkey = o.o_custkey AND c.c_mktsegment = 'BUILDING')
    """,
    doc="S7: filtered read-back + left-semi EXISTS + fixed-layout re-projection",
)
def s7_readback_reprojection(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    active = cust.where(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    return (
        orders.where(
            (F.col("o_orderstatus") == "O")
            & ~F.col("o_orderpriority").isin("4-NOT SPECIFIED", "5-LOW")
        )
        .join(F.broadcast(active), orders.o_custkey == active.c_custkey, "left_semi")
        .select(
            F.lit("ORD").alias("db"),
            F.concat(F.lit("ORD:"), F.col("o_orderkey").cast("string")).alias(
                "db_object_id"
            ),
            F.col("o_orderpriority").alias("qualifier"),
            F.col("o_custkey").cast("long").alias("object_key"),
            F.date_format("o_orderdate", "yyyyMMdd").alias("date_str"),
        )
    )


# ---------------------------------------------------------------------------
# S9 — audit side-output: rows rejected by a lookup become a queryable
# side table (the reference's 13 categorized logs, log4j2.xml:9-91).
# ---------------------------------------------------------------------------
@register(
    "s9_audit_side_output",
    """
    SELECT e.event_id, e.user_id, e.event_type
    FROM events e
    WHERE NOT EXISTS (SELECT 1 FROM customer c
                      WHERE c.c_custkey = e.user_id AND c.c_acctbal > 5000)
    """,
    doc="S9: unmatched-rows audit side output (anti join)",
)
def s9_audit_side_output(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    cust = load_table(spark, sf_dir, "customer")
    rich = cust.where(F.col("c_acctbal") > 5000).select("c_custkey")
    return ev.join(
        F.broadcast(rich), ev.user_id == rich.c_custkey, "left_anti"
    ).select("event_id", "user_id", "event_type")


# ---------------------------------------------------------------------------
# P2 — doubled-prefix collapse (MGI:MGI: → MGI:, MAHParser.java:50)
# ---------------------------------------------------------------------------
@register(
    "p02_double_prefix_collapse",
    """
    SELECT doc_id,
           REGEXP_REPLACE('src:' || source, '^src:src', 'src') AS norm_id
    FROM documents
    """,
    doc="P2: regexp_replace doubled-prefix normalization",
)
def p02_double_prefix_collapse(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.regexp_replace(
            F.concat(F.lit("src:"), F.col("source")), "^src:src", "src"
        ).alias("norm_id"),
    )


# ---------------------------------------------------------------------------
# P6 — conditional prefixing (HGNC: prefix if missing, MAHQC.java:111-113)
# ---------------------------------------------------------------------------
@register(
    "p06_conditional_prefix",
    """
    SELECT doc_id,
           CASE WHEN lang LIKE 'lang:%' THEN lang ELSE 'lang:' || lang END AS lang_id
    FROM documents
    """,
    doc="P6: prepend prefix when missing",
)
def p06_conditional_prefix(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    c = F.col("lang")
    return docs.select(
        "doc_id",
        F.when(c.startswith("lang:"), c).otherwise(F.concat(F.lit("lang:"), c)).alias(
            "lang_id"
        ),
    )


# ---------------------------------------------------------------------------
# P7 — compound-id split (URS00022AD472_9606 → acc + taxon, MAHQC.java:120-135)
# ---------------------------------------------------------------------------
@register(
    "p07_compound_id_split",
    """
    SELECT doc_id,
           SPLIT_PART(source || '_' || CAST(doc_id AS VARCHAR), '_', 1) AS acc,
           CAST(SPLIT_PART(source || '_' || CAST(doc_id AS VARCHAR), '_', 2) AS BIGINT) AS taxon_id
    FROM documents
    """,
    doc="P7: split compound accession into id + taxon",
)
def p07_compound_id_split(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    compound = F.concat(F.col("source"), F.lit("_"), F.col("doc_id").cast("string"))
    parts = F.split(compound, "_")
    return docs.select(
        "doc_id",
        parts.getItem(0).alias("acc"),
        parts.getItem(1).cast("long").alias("taxon_id"),
    )


# ---------------------------------------------------------------------------
# P8 — alt-id fallback extraction (DB:ID → part after ':', MAHQC.java:157-164)
# ---------------------------------------------------------------------------
@register(
    "p08_alt_id_extract",
    """
    SELECT p_partkey,
           CAST(SPLIT_PART(p_brand, '#', 2) AS INTEGER) AS brand_num
    FROM part
    """,
    doc="P8: split DB:ID-style token, take trailing id",
)
def p08_alt_id_extract(spark, sf_dir):
    part = load_table(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.split(F.col("p_brand"), "#").getItem(1).cast("int").alias("brand_num"),
    )


# ---------------------------------------------------------------------------
# P9 — qualifier normalization: trim, empty→NULL, term substitution
# (MAHQC.java:290-294)
# ---------------------------------------------------------------------------
@register(
    "p09_qualifier_normalize",
    """
    SELECT doc_id,
           NULLIF(REGEXP_REPLACE(TRIM(CASE WHEN lang = 'en' THEN ' colocalizes_with '
                                           WHEN lang = 'de' THEN '  '
                                           ELSE lang END),
                                 'colocalizes_with', 'located_in'), '') AS qualifier
    FROM documents
    """,
    doc="P9: trim + empty→NULL + dictionary substitution",
)
def p09_qualifier_normalize(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    raw = (
        F.when(F.col("lang") == "en", F.lit(" colocalizes_with "))
        .when(F.col("lang") == "de", F.lit("  "))
        .otherwise(F.col("lang"))
    )
    return docs.select(
        "doc_id",
        F.nullif(
            F.regexp_replace(F.trim(raw), "colocalizes_with", "located_in"), F.lit("")
        ).alias("qualifier"),
    )


# ---------------------------------------------------------------------------
# P10 — DATA_SRC dictionary substitution (MAHQC.java:310-316)
# ---------------------------------------------------------------------------
@register(
    "p10_data_src_substitution",
    """
    SELECT c_custkey,
           CASE c_mktsegment WHEN 'AUTOMOBILE' THEN 'AUTO'
                             WHEN 'HOUSEHOLD' THEN 'HOME'
                             ELSE c_mktsegment END AS data_src
    FROM customer
    """,
    doc="P10: small dictionary remap",
)
def p10_data_src_substitution(spark, sf_dir):
    cust = load_table(spark, sf_dir, "customer")
    c = F.col("c_mktsegment")
    return cust.select(
        "c_custkey",
        F.when(c == "AUTOMOBILE", "AUTO").when(c == "HOUSEHOLD", "HOME").otherwise(c).alias(
            "data_src"
        ),
    )


# ---------------------------------------------------------------------------
# P11 — self-referencing-row filter (MAHQC.java:252-256)
# ---------------------------------------------------------------------------
@register(
    "p11_self_ref_filter",
    """
    SELECT l_returnflag, COUNT(*) AS kept
    FROM lineitem
    WHERE NOT (l_suppkey = l_orderkey % 100)
    GROUP BY l_returnflag
    """,
    doc="P11: drop rows whose ref column points at themselves",
)
def p11_self_ref_filter(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.where(~(F.col("l_suppkey") == F.col("l_orderkey") % 100))
        .groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("kept"))
    )


# ---------------------------------------------------------------------------
# P12 — conditional field move: gated append to a multi-value column,
# blanking the source field (ISO gene_product_form_id → with_info,
# MAHQC.java:258-270)
# ---------------------------------------------------------------------------
@register(
    "p12_gated_field_move",
    """
    SELECT doc_id,
           CASE WHEN lang = 'en' AND source <> ''
                THEN lang || ',' || source ELSE lang END AS with_info,
           CASE WHEN lang = 'en' THEN '' ELSE source END AS gene_product_form_id
    FROM documents
    """,
    doc="P12: gated append-to-multivalue + blank source field",
)
def p12_gated_field_move(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    gate = (F.col("lang") == "en") & (F.col("source") != "")
    return docs.select(
        "doc_id",
        F.when(gate, F.concat_ws(",", F.col("lang"), F.col("source")))
        .otherwise(F.col("lang"))
        .alias("with_info"),
        F.when(F.col("lang") == "en", F.lit("")).otherwise(F.col("source")).alias(
            "gene_product_form_id"
        ),
    )


# ---------------------------------------------------------------------------
# P13 — gated empty-field drop (ISO with empty WITH_INFO, MAHQC.java:272-276)
# ---------------------------------------------------------------------------
@register(
    "p13_gated_empty_drop",
    """
    SELECT doc_id, lang, with_info FROM (
      SELECT doc_id, lang,
             CASE WHEN n_chars % 7 = 0 THEN '' ELSE source END AS with_info
      FROM documents)
    WHERE NOT (lang = 'en' AND with_info = '')
    """,
    doc="P13: drop gated rows whose multi-value field is empty",
)
def p13_gated_empty_drop(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    wi = F.when(F.col("n_chars") % 7 == 0, F.lit("")).otherwise(F.col("source"))
    return (
        docs.select("doc_id", "lang", wi.alias("with_info"))
        .where(~((F.col("lang") == "en") & (F.col("with_info") == "")))
    )


# ---------------------------------------------------------------------------
# P14 — gated column clear (ISO annotation_extension, MAHQC.java:278-283)
# ---------------------------------------------------------------------------
@register(
    "p14_gated_column_clear",
    """
    SELECT event_id,
           CASE WHEN event_type = 'error' THEN '' ELSE props END AS annotation_extension
    FROM events
    """,
    doc="P14: blank a column under a gate predicate",
)
def p14_gated_column_clear(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.when(F.col("event_type") == "error", F.lit(""))
        .otherwise(F.col("props"))
        .alias("annotation_extension"),
    )


# ---------------------------------------------------------------------------
# P15 — date parse/format round-trip (yyyyMMdd ↔ date, MAHQC.java:343-345)
# ---------------------------------------------------------------------------
@register(
    "p15_date_parse_format",
    """
    SELECT STRFTIME(o_orderdate, '%Y%m%d') AS yyyymmdd,
           CAST(STRPTIME(STRFTIME(o_orderdate, '%Y%m%d'), '%Y%m%d') AS DATE) AS parsed_date,
           COUNT(*) AS n
    FROM orders GROUP BY 1, 2
    """,
    doc="P15: yyyyMMdd string ↔ date round trip",
)
def p15_date_parse_format(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    s = F.date_format("o_orderdate", "yyyyMMdd")
    return (
        orders.select(
            s.alias("yyyymmdd"), F.to_date(s, "yyyyMMdd").alias("parsed_date")
        )
        .groupBy("yyyymmdd", "parsed_date")
        .agg(F.count(F.lit(1)).alias("n"))
    )


# ---------------------------------------------------------------------------
# P17 — null-default + null-safe equality helpers (rgdcore Utils.NVL /
# stringsAreEqual; MAHDL.java:130-134)
# ---------------------------------------------------------------------------
@register(
    "p17_null_safe_helpers",
    """
    SELECT COALESCE(NULLIF(o_orderstatus, 'O'), '*') AS status_nvl,
           (NULLIF(o_orderstatus, 'O') IS NOT DISTINCT FROM NULLIF(o_orderpriority, '1-URGENT')) AS both_null,
           COUNT(*) AS n
    FROM orders GROUP BY 1, 2
    """,
    doc="P17: NVL + null-safe equality",
)
def p17_null_safe_helpers(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    a = F.nullif(F.col("o_orderstatus"), F.lit("O"))
    b = F.nullif(F.col("o_orderpriority"), F.lit("1-URGENT"))
    return (
        orders.select(
            F.coalesce(a, F.lit("*")).alias("status_nvl"),
            a.eqNullSafe(b).alias("both_null"),
        )
        .groupBy("status_nvl", "both_null")
        .agg(F.count(F.lit(1)).alias("n"))
    )


# ---------------------------------------------------------------------------
# J1 — per-source key dispatch + broadcast match (MAHQC.java:101-167):
# the join key column set depends on the source tag of each row.
# ---------------------------------------------------------------------------
@register(
    "j01_multikey_dispatch_match",
    """
    SELECT l.l_orderkey, l.l_linenumber,
           COALESCE(p.p_name, s.s_name) AS matched_name,
           CASE WHEN p.p_partkey IS NOT NULL THEN 'part'
                WHEN s.s_suppkey IS NOT NULL THEN 'supplier'
                ELSE 'unmatched' END AS match_kind
    FROM lineitem l
    LEFT JOIN part p ON l.l_returnflag = 'R' AND l.l_partkey = p.p_partkey
    LEFT JOIN supplier s ON l.l_returnflag <> 'R' AND l.l_suppkey = s.s_suppkey
    """,
    doc="J1: source-dependent key dispatch, broadcast hash join",
)
def j01_multikey_dispatch_match(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    supp = load_table(spark, sf_dir, "supplier")
    j = (
        li.join(
            F.broadcast(part),
            (F.col("l_returnflag") == "R") & (li.l_partkey == part.p_partkey),
            "left",
        ).join(
            F.broadcast(supp),
            (F.col("l_returnflag") != "R") & (li.l_suppkey == supp.s_suppkey),
            "left",
        )
    )
    return j.select(
        "l_orderkey",
        "l_linenumber",
        F.coalesce(F.col("p_name"), F.col("s_name")).alias("matched_name"),
        F.when(F.col("p_partkey").isNotNull(), "part")
        .when(F.col("s_suppkey").isNotNull(), "supplier")
        .otherwise("unmatched")
        .alias("match_kind"),
    )


# ---------------------------------------------------------------------------
# J2 — fallback join cascade, first-hit-wins (MAHQC.java:106-164)
# ---------------------------------------------------------------------------
@register(
    "j02_fallback_cascade",
    """
    SELECT e.event_id,
           COALESCE(c1.c_name, c2.c_name) AS matched_customer,
           CASE WHEN c1.c_custkey IS NOT NULL THEN 'primary'
                WHEN c2.c_custkey IS NOT NULL THEN 'secondary'
                ELSE 'unmatched' END AS match_source
    FROM events e
    LEFT JOIN customer c1 ON e.user_id = c1.c_custkey AND c1.c_acctbal >= 5000
    LEFT JOIN customer c2 ON e.user_id = c2.c_custkey
    """,
    doc="J2: primary/secondary fallback key cascade",
)
def j02_fallback_cascade(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    cust = load_table(spark, sf_dir, "customer")
    c1 = cust.where(F.col("c_acctbal") >= 5000).select(
        F.col("c_custkey").alias("k1"), F.col("c_name").alias("name1")
    )
    c2 = cust.select(F.col("c_custkey").alias("k2"), F.col("c_name").alias("name2"))
    return (
        ev.join(F.broadcast(c1), ev.user_id == F.col("k1"), "left")
        .join(F.broadcast(c2), ev.user_id == F.col("k2"), "left")
        .select(
            "event_id",
            F.coalesce("name1", "name2").alias("matched_customer"),
            F.when(F.col("k1").isNotNull(), "primary")
            .when(F.col("k2").isNotNull(), "secondary")
            .otherwise("unmatched")
            .alias("match_source"),
        )
    )


# ---------------------------------------------------------------------------
# J5 — post-match guard filter (species check, MAHQC.java:87-91)
# ---------------------------------------------------------------------------
@register(
    "j05_post_match_guard",
    """
    SELECT CASE WHEN c.c_nationkey = 12 THEN 'expected' ELSE 'wrong_species' END AS guard,
           COUNT(*) AS n
    FROM events e JOIN customer c ON e.user_id = c.c_custkey
    GROUP BY 1
    """,
    doc="J5: post-join guard outcome split",
)
def j05_post_match_guard(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    cust = load_table(spark, sf_dir, "customer")
    return (
        ev.join(F.broadcast(cust), ev.user_id == cust.c_custkey)
        .select(
            F.when(F.col("c_nationkey") == 12, "expected")
            .otherwise("wrong_species")
            .alias("guard")
        )
        .groupBy("guard")
        .agg(F.count(F.lit(1)).alias("n"))
    )


# ---------------------------------------------------------------------------
# J6 — two-hop edge join (gene → ortholog edge → rat gene,
# MAHQC.java:195-220): customer → nation → region here.
# ---------------------------------------------------------------------------
@register(
    "j06_two_hop_edge_join",
    """
    SELECT c.c_custkey, n.n_name AS nation_name, r.r_name AS region_name
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name IN ('ASIA', 'EUROPE')
    """,
    doc="J6: two-hop edge-table join with terminal filter",
)
def j06_two_hop_edge_join(spark, sf_dir):
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    return (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .where(F.col("r_name").isin("ASIA", "EUROPE"))
        .select(
            "c_custkey",
            F.col("n_name").alias("nation_name"),
            F.col("r_name").alias("region_name"),
        )
    )


# ---------------------------------------------------------------------------
# J7 — evidence-code gate (MAHQC.java:208-217): keep gated rows…
# ---------------------------------------------------------------------------
@register(
    "j07_evidence_gate",
    """
    SELECT event_id, event_type, value
    FROM events
    WHERE event_type IN ('purchase', 'signup', 'click')
    """,
    doc="J7: membership gate for derivation eligibility",
)
def j07_evidence_gate(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    return ev.where(F.col("event_type").isin("purchase", "signup", "click")).select(
        "event_id", "event_type", "value"
    )


# ---------------------------------------------------------------------------
# A2 — …and count the rejected ones per code (MAHQC.java:222-230)
# ---------------------------------------------------------------------------
@register(
    "a2_rejected_code_counts",
    """
    SELECT event_type AS rejected_code, COUNT(*) AS n
    FROM events
    WHERE event_type NOT IN ('purchase', 'signup', 'click')
    GROUP BY event_type
    """,
    doc="A2: rejected-code counter frame",
)
def a2_rejected_code_counts(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.where(~F.col("event_type").isin("purchase", "signup", "click"))
        .groupBy(F.col("event_type").alias("rejected_code"))
        .agg(F.count(F.lit(1)).alias("n"))
    )


# ---------------------------------------------------------------------------
# J8 — lookup join with null-side audit (GO term lookup, MAHQC.java:300-308)
# ---------------------------------------------------------------------------
@register(
    "j08_lookup_with_null_audit",
    """
    SELECT e.event_id, c.c_name AS term_name,
           (c.c_custkey IS NULL) AS missing_term
    FROM events e
    LEFT JOIN customer c ON e.user_id = c.c_custkey AND c.c_acctbal > 8000
    """,
    doc="J8: left-join lookup; null side is the audit output",
)
def j08_lookup_with_null_audit(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    cust = load_table(spark, sf_dir, "customer")
    dim = cust.where(F.col("c_acctbal") > 8000)
    return ev.join(F.broadcast(dim), ev.user_id == dim.c_custkey, "left").select(
        "event_id",
        F.col("c_name").alias("term_name"),
        F.col("c_custkey").isNull().alias("missing_term"),
    )


# ---------------------------------------------------------------------------
# J9 — exclusion-list anti-join (Not4Curation, MAHQC.java:61-67)
# ---------------------------------------------------------------------------
@register(
    "j09_exclusion_anti_join",
    """
    SELECT l.l_orderkey, l.l_linenumber, l.l_partkey
    FROM lineitem l
    WHERE NOT EXISTS (SELECT 1 FROM part p
                      WHERE p.p_partkey = l.l_partkey AND p.p_size > 40)
    """,
    doc="J9: left-anti join against an excluded-keys dim",
)
def j09_exclusion_anti_join(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    excluded = part.where(F.col("p_size") > 40).select("p_partkey")
    return li.join(
        F.broadcast(excluded), li.l_partkey == excluded.p_partkey, "left_anti"
    ).select("l_orderkey", "l_linenumber", "l_partkey")


# ---------------------------------------------------------------------------
# J11 — null-safe multi-field natural-key match (Oracle NVL key,
# MAHDL.java:137 / DAO.java:154-157)
# ---------------------------------------------------------------------------
@register(
    "j11_nullsafe_key_match",
    """
    WITH keyed AS (
      SELECT o_orderkey, NULLIF(o_orderpriority, '3-MEDIUM') AS k1,
             NULLIF(o_orderstatus, 'P') AS k2
      FROM orders
    ), dim AS (
      SELECT * FROM (VALUES ('1-URGENT', 'F', 'urgent-filled'),
                            (NULL, 'O', 'medium-open'),
                            (NULL, NULL, 'medium-pending')) AS t(k1, k2, tag)
    )
    SELECT k.o_orderkey, d.tag
    FROM keyed k JOIN dim d
      ON k.k1 IS NOT DISTINCT FROM d.k1 AND k.k2 IS NOT DISTINCT FROM d.k2
    """,
    doc="J11: null-safe (<=>) composite-key join",
)
def j11_nullsafe_key_match(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    keyed = orders.select(
        "o_orderkey",
        F.nullif(F.col("o_orderpriority"), F.lit("3-MEDIUM")).alias("k1"),
        F.nullif(F.col("o_orderstatus"), F.lit("P")).alias("k2"),
    )
    dim = spark.createDataFrame(
        [("1-URGENT", "F", "urgent-filled"), (None, "O", "medium-open"), (None, None, "medium-pending")],
        "k1 string, k2 string, tag string",
    )
    return keyed.join(
        F.broadcast(dim),
        keyed.k1.eqNullSafe(dim.k1) & keyed.k2.eqNullSafe(dim.k2),
    ).select("o_orderkey", "tag")


# ---------------------------------------------------------------------------
# J12 — active-entities semi-join (EXISTS, DAO.java:260-268)
# ---------------------------------------------------------------------------
@register(
    "j12_active_semi_join",
    """
    SELECT c.c_custkey, c.c_name
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'O')
    """,
    doc="J12: left-semi EXISTS join",
)
def j12_active_semi_join(spark, sf_dir):
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    open_orders = orders.where(F.col("o_orderstatus") == "O").select("o_custkey")
    return cust.join(
        open_orders, cust.c_custkey == open_orders.o_custkey, "left_semi"
    ).select("c_custkey", "c_name")


# ---------------------------------------------------------------------------
# A1 — per-source line counts (MAHParser.java:55-62)
# ---------------------------------------------------------------------------
@register(
    "a1_source_line_counts",
    "SELECT event_type, COUNT(*) AS n_lines FROM events GROUP BY event_type",
    doc="A1: per-source line counter frame",
)
def a1_source_line_counts(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("n_lines"))


# ---------------------------------------------------------------------------
# A6 — before/after count report with signed diff
# (GoNonratAnnotationPipeline.java:236-283)
# ---------------------------------------------------------------------------
@register(
    "a6_before_after_counts",
    """
    SELECT o_orderstatus,
           CAST(SUM(CASE WHEN o_orderdate <  TIMESTAMP '1999-01-01 00:00:00' THEN 1 ELSE 0 END) AS BIGINT) AS before_n,
           CAST(SUM(CASE WHEN o_orderdate >= TIMESTAMP '1999-01-01 00:00:00' THEN 1 ELSE 0 END) AS BIGINT) AS after_n,
           CAST(SUM(CASE WHEN o_orderdate >= TIMESTAMP '1999-01-01 00:00:00' THEN 1 ELSE 0 END)
             - SUM(CASE WHEN o_orderdate < TIMESTAMP '1999-01-01 00:00:00' THEN 1 ELSE 0 END) AS BIGINT) AS diff_n
    FROM orders GROUP BY o_orderstatus
    """,
    doc="A6: before/after snapshot counts + signed diff",
)
def a6_before_after_counts(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    cutoff = F.lit("1999-01-01 00:00:00").cast("timestamp")
    before = F.sum(F.when(F.col("o_orderdate") < cutoff, 1).otherwise(0))
    after = F.sum(F.when(F.col("o_orderdate") >= cutoff, 1).otherwise(0))
    return orders.groupBy("o_orderstatus").agg(
        before.alias("before_n"),
        after.alias("after_n"),
        (after - before).alias("diff_n"),
    )


# ---------------------------------------------------------------------------
# Five-table dimension chain join + aggregate (TPC-H Q5 shape). Catalyst
# reorders the joins and broadcasts every dimension side; only lineitem
# (the fact) streams — no fact-side shuffle until the final group-by.
# ---------------------------------------------------------------------------
@register(
    "q5_multiway_join_agg",
    """
    SELECT n_name,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
           COUNT(*) AS n_items
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
    GROUP BY n_name
    """,
    doc="5-table broadcast-chain join + hash aggregate (TPC-H Q5 shape)",
)
def q5_multiway_join_agg(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .where(F.col("r_name") == "ASIA")
        .groupBy("n_name")
        .agg(
            F.sum(
                F.col("l_extendedprice").cast(DEC2)
                * (F.lit(1) - F.col("l_discount").cast(DEC2))
            )
            .cast("double")
            .alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


# ---------------------------------------------------------------------------
# ROLLUP hierarchy aggregate: one pass produces (status, priority),
# (status), and grand-total grouping sets — Spark expands the sets
# map-side, still a single hash-aggregate shuffle.
# ---------------------------------------------------------------------------
@register(
    "q_rollup_status_priority",
    """
    SELECT o_orderstatus, o_orderpriority,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
    FROM orders
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
    doc="ROLLUP grouping-sets aggregate in one shuffle",
)
def q_rollup_status_priority(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    return orders.rollup("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.col("o_totalprice").cast(DEC2))
        .cast("double")
        .alias("total_price"),
    )
