"""Float-discipline lint over the whole query registry.

The only correctness failures the engine has ever had at the driver's
hash boundary (rounds 1-3) were raw DOUBLE / unstable-typed columns in
a final projection (VERDICT.md round 3 "What's wrong"). The registry
docstring's rule — aggregates over doubles computed in DECIMAL, floats
only when ROUND()ed identically on both engines — is enforced here
mechanically: every registered query's OUTPUT schema may contain
floating-point columns only if (query, column) appears in the AUDITED
map below with one of the three hash-stable classes (rounded /
decimal-cast / passthrough — see the map's comment). Anything else —
above all a float aggregate over doubles — fails the lint before it
can fail a driver round.

Since round 6 the lint also checks the ORACLE side: every registered
DuckDB oracle is bound (lazily — .types plans without executing) and
any HUGEINT / UHUGEINT / DECIMAL / TIMESTAMP / list result column
fails. This is the blind spot that made four rows red in round 5
(VERDICT.md r5 "What's wrong" #1/#2): DuckDB types a bare SUM(int) as
HUGEINT (int128) while Spark ships BIGINT — values identical, typed
hashes diverge, and the Spark-only schema check above never sees it.
The rule mirrors the Spark-side ban: cast oracle aggregates to BIGINT
(or DOUBLE via one deterministic cast) in the final projection.

Usage: python tools/float_lint.py [sf_dir]   (default sf0.001)
Exit code 1 on any unaudited float column or banned oracle type.

Building a DataFrame is enough to see its schema; queries with eager
driver-side stages (k-means training, streaming drains) do run work,
so the lint takes a few minutes — run it per-round, not per-test.
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql.types import (  # noqa: E402
    ArrayType,
    DecimalType,
    DoubleType,
    FloatType,
    MapType,
    TimestampNTZType,
    TimestampType,
)

from go_nonrat_annotation_pipeline_spark.plans.registry import all_queries  # noqa: E402
from go_nonrat_annotation_pipeline_spark.session import get_spark  # noqa: E402

# (query, column) → audited hash-stability class:
#   rounded      — ROUND(x, 6) of identically-computed expressions on
#                  both engines (same fold order → same double → same
#                  rounded value)
#   decimal-cast — computed EXACTLY in DECIMAL, cast to double only in
#                  the final projection (one deterministic conversion)
#   passthrough  — a raw input value carried untouched from parquet
#                  (incl. discrete percentiles, which PICK raw values)
# The forbidden class — which this lint exists to catch — is a float
# AGGREGATE over doubles (SUM/AVG of double), whose value depends on
# partition-local accumulation order.
#
# Separately, three whole TYPE classes are banned outright in any final
# projection, with NO allowlist — the empirical driver-boundary rule
# (VERDICT.md round 4 "What's wrong" #2): the driver's hasher diverges
# on DECIMAL output columns even when rows+schema+values all agree
# (stream_tumbling_agg, red two rounds on a value-identical
# DECIMAL(38,6) column), and arrays/timestamps were the r3 offender
# classes. DECIMAL is still the REQUIRED internal representation for
# exact aggregation — it just must be converted (integer micro-units
# BIGINT, or a double via one deterministic cast) before the boundary.
BANNED_BOUNDARY_TYPES = (
    DecimalType,
    ArrayType,
    MapType,
    TimestampType,
    TimestampNTZType,
)

AUDITED = {
    ("dedup_minhash_lsh", "jaccard"): "rounded",
    ("dedup_ngram_jaccard", "jaccard"): "rounded",
    ("dedup_embedding_cosine", "cosine"): "rounded",
    ("dedup_embedding_bucketed", "cosine"): "rounded",
    ("dedup_embedding_bucketed_kernel", "cosine"): "rounded",
    ("dedup_incremental", "jaccard"): "rounded",
    ("stream_incremental_dedup", "jaccard"): "rounded",
    ("sim_topk_bruteforce", "cosine"): "rounded",
    ("sim_lsh_ann", "cosine"): "rounded",
    ("sim_lsh_multitable", "cosine"): "rounded",
    ("sim_ivf_ann", "cosine"): "rounded",
    ("sim_ivf_trained", "cosine"): "rounded",
    ("sim_ivf_trained_kernel", "cosine"): "rounded",
    ("sim_pq_adc", "adc_score"): "rounded",
    ("sim_pq_adc_kernel", "adc_score"): "rounded",
    ("sim_pq_rerank", "cosine"): "rounded",
    ("sim_ivf_pq", "cosine"): "rounded",
    ("q_semdedup_drops", "cosine"): "rounded",
    ("q_tfidf_topterms", "tfidf"): "rounded",
    ("q_bm25_search", "bm25"): "rounded",
    ("q_bm25_multi", "bm25"): "rounded",
    ("text_quality_score", "avg_token_len"): "rounded",
    ("text_quality_score", "stopword_ratio"): "rounded",
    ("text_quality_score", "punct_ratio"): "rounded",
    ("q1_pricing_summary", "sum_qty"): "decimal-cast",
    ("q1_pricing_summary", "sum_base_price"): "decimal-cast",
    ("q1_pricing_summary", "sum_disc_price"): "decimal-cast",
    ("q5_multiway_join_agg", "revenue"): "decimal-cast",
    ("q_rollup_status_priority", "total_price"): "decimal-cast",
    ("s3_scan_project_filter", "l_extendedprice"): "passthrough",
    ("s4_prefilter_scan", "value"): "passthrough",
    ("j07_evidence_gate", "value"): "passthrough",
    ("w1_topk_per_group", "o_totalprice"): "passthrough",
    ("q_global_topk", "o_totalprice"): "passthrough",
    ("q_percentile_disc", "p50"): "passthrough",
    ("q_percentile_disc", "p90"): "passthrough",
    ("q_lm_perplexity_bucket", "ce"): "rounded",
    ("q_mixture_drift_kl", "kl_contrib"): "rounded",
    # round 10: semantic decontamination cosines follow the attested
    # sim_* discipline (sequential double reduce over DOUBLE-cast
    # arrays on both engines, ROUND(...,6)); the cube measure is the
    # rollup's decimal-exact sum cast to double at the boundary
    ("q_semantic_decontam", "cosine"): "rounded",
    ("q_semantic_decontam_report", "max_cosine"): "rounded",
    ("stream_semantic_decontam_gate", "cosine"): "rounded",
    ("q_cube_grouping_id", "total_price"): "decimal-cast",
    # round 11: the exact-ANN twin re-ranks with the SAME rounded
    # cosine expression as its brute-force oracle
    ("q_semantic_decontam_ann", "cosine"): "rounded",
    ("q_semantic_decontam_ann_kernel", "cosine"): "rounded",
    ("sim_knn_exact_cells", "cosine"): "rounded",
    ("stream_knn_exact", "cosine"): "rounded",
    ("stream_semantic_decontam_gate_ann", "cosine"): "rounded",
    ("q_semantic_decontam_ann_report", "max_hit_cosine"): "rounded",
    ("dedup_embedding_exact_pairs", "cosine"): "rounded",
    ("dedup_embedding_exact_pairs_drained", "cosine"): "rounded",
    ("dedup_embedding_exact_pairs_drained_hot", "cosine"): "rounded",
    ("q_mad_outliers", "med"): "passthrough",
    ("dedup_exact_pairs_incremental", "cosine"): "rounded",
}


# Oracle-side (DuckDB) banned result types, upper-cased substrings of
# str(duckdb type). HUGEINT covers DuckDB's int128 SUM(int) default;
# list/struct/map cover nested types the driver hasher can't canonize.
ORACLE_BANNED_SUBSTRINGS = (
    "HUGEINT",  # also matches UHUGEINT
    "DECIMAL",
    "TIMESTAMP",
    "[]",       # list types print as e.g. VARCHAR[]
    "STRUCT",
    "MAP(",
)


def lint_oracles(qs, sf_dir: str) -> list[tuple[str, str, str]]:
    """Bind every oracle in DuckDB and flag banned result-column types.

    Binding is lazy (.types plans, never executes), so this pass is
    milliseconds per query regardless of sf.
    """
    import duckdb

    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem "
        "events documents embeddings".split()
    ):
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')"
            )
    bad: list[tuple[str, str, str]] = []
    for name, q in qs.items():
        if q.oracle is None:
            continue  # rows-only check at the driver; no typed hash
        try:
            rel = con.sql(q.oracle)
            cols, types = rel.columns, rel.types
        except Exception as e:  # noqa: BLE001 — report, don't abort
            bad.append((name, "<oracle bind failed>", repr(e)[:120]))
            continue
        for c, t in zip(cols, types):
            ts = str(t).upper()
            if any(s in ts for s in ORACLE_BANNED_SUBSTRINGS):
                bad.append((name, c, f"ORACLE BANNED {t}"))
    return bad


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("float_lint")
    spark.sparkContext.setLogLevel("ERROR")
    bad: list[tuple[str, str, str]] = []
    audited_seen = set()
    qs = all_queries()
    bad.extend(lint_oracles(qs, sf_dir))
    for name, q in qs.items():
        try:
            schema = q.spark(spark, sf_dir).schema
        except Exception as e:  # noqa: BLE001 — report, don't abort the lint
            bad.append((name, "<build failed>", repr(e)[:120]))
            continue
        for f in schema.fields:
            if isinstance(f.dataType, (DoubleType, FloatType)):
                if (name, f.name) in AUDITED:
                    audited_seen.add((name, f.name))
                else:
                    bad.append((name, f.name, str(f.dataType)))
            elif isinstance(f.dataType, BANNED_BOUNDARY_TYPES):
                # No allowlist for these: empirically the driver hasher
                # diverges on them even when both engines' VALUES agree.
                bad.append((name, f.name, f"BANNED {f.dataType}"))
    stale = set(AUDITED) - audited_seen
    for name, col in sorted(stale):
        print(f"STALE ALLOWLIST {name}.{col} (column no longer emitted)")
    for name, col, t in bad:
        label = "VIOLATION" if t.startswith("ORACLE") else "UNAUDITED FLOAT"
        print(f"{label} {name}.{col}: {t}")
    print(
        f"{len(qs)} queries checked; {len(audited_seen)} audited float "
        f"columns; {len(bad)} violations; {len(stale)} stale allowlist rows"
    )
    return 1 if bad or stale else 0


if __name__ == "__main__":
    sys.exit(main())
