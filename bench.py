"""Benchmark harness: runs the engine's headline queries and prints ONE
JSON line {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}.

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS  (default: all cores).

Record-integrity policy (round 13, VERDICT r12 What's wrong #2 and
Next #3/#6):

- CALIBRATION ROW: every record carries ``calibration`` — best-of-3
  wall of a fixed synthetic CPU-bound job (constant-seeded 5M-row
  hash sort, no repo data, no parquet). Cross-day absolute seconds on
  this box scatter ±20-45% on byte-identical plans (SCALE.md drift
  postscript); dividing any row by the record's own calibration
  normalizes host speed and ends round-over-round relitigation.
- SESSION ISOLATION: the extended set restarts the Spark session
  every ``_RESTART_EVERY`` rows. r12's 85-row single-session sweep
  accumulated JVM/session state that poisoned individual rows up to
  3.7× (q_simjoin_pairs 25.0s recorded vs 7.8s fresh-session); with
  periodic restarts each row's best-of-N is evidence-grade again.
  (Headline set stays single-session — 20 rows never showed the
  contamination, and its round-over-round comparability predates
  this policy.)
- EFFECTIVE PARALLELISM (round 14, VERDICT r13 Next #2): the compact
  JSON line and the full summary both carry ``parallelism`` =
  ``spark.sparkContext.defaultParallelism`` so the driver's
  ``$SPARK_GRAFT_CPUS`` probe can read the honored core count directly
  instead of inferring it from per-query 8-vs-32 ratios. Those ratios
  are ≈1 BY CONSTRUCTION on the headline set: every row is sub-2s at
  sf0.1, where planner/scheduling fixed cost — not compute — dominates,
  so core count cannot show there; the scaling signal lives in the
  heavy extended rows.
- EXTENDED BUDGET: the extended set grows ~13 rows/round and best-of-3
  on every heavy E2E would dominate the round's bench wall by r15.
  Budget rule: a row whose FIRST timed execution exceeds
  ``_HEAVY_SECS`` gets one further rep (best-of-2); everything else
  keeps best-of-3. Heavy rows are multi-second E2Es where ±noise is
  proportionally small, so the lost third rep costs little evidence;
  the per-round record stays within a bounded wall instead of growing
  linearly with registry age.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from go_nonrat_annotation_pipeline_spark.plans.registry import all_queries
from go_nonrat_annotation_pipeline_spark.session import get_spark

# Representative heavy-path queries (scan-heavy agg, dispatch join, cascade,
# anti/semi joins, consolidation, upsert, window, dedup/similarity/text once
# registered). Anything listed here but not yet registered is skipped.
# FROZEN as of round 2 — keep this set stable so round-over-round deltas
# are attributable; add new queries to correctness, not here.
HEADLINE = [
    "q1_pricing_summary",
    "q5_multiway_join_agg",
    "q_rollup_status_priority",
    "j01_multikey_dispatch_match",
    "j02_fallback_cascade",
    "j09_exclusion_anti_join",
    "j12_active_semi_join",
    "a3_withinfo_consolidate",
    "a4_duplicate_merge",
    "a7_upsert_classification",
    "j04_history_resolution",
    "w1_topk_per_group",
    "w2_sessionize",
    "dedup_exact",
    "dedup_minhash_lsh",
    "sim_topk_bruteforce",
    "sim_lsh_multitable",
    "sim_ivf_ann",
    "text_quality_score",
    "corpus_clean_pipeline",
]

# Round-2+ additions, timed separately so the frozen headline total stays
# comparable round-over-round. Same best-of-2 + fingerprint treatment.
EXTENDED = [
    "q_asof_attribution",
    "q_range_window_count",
    "q_salted_skew_join",
    "q_sequence_packing",
    # round 3: dedup_clusters now IS the star algorithm (r2's
    # dedup_clusters_star renamed; min-label became dedup_clusters_minlabel)
    # — same operator timed, comparable to r2's dedup_clusters_star row.
    "dedup_clusters",
    # round 4 additions
    "dedup_incremental",
    "q_hist_quantile_state",
    "q_snapshot_diff_counts",
    "q_semdedup_drops",
    "q_pii_redact",
    "corpus_curation_e2e",
    "corpus_refresh_e2e",
    # round 6 additions
    "q_dsir_scores",
    "q_boilerplate_strip",
    "q_shuffle_shards",
    "corpus_build_e2e",
    "q_lm_perplexity_bucket",
    "q_pagerank_topk",
    "dedup_simhash_hamming",
    "q_incremental_agg_maintain",
    "q_interval_overlap_join",
    "q_dupspan_strip",
    # round 6, continuation session: packing / temperature mixture /
    # SCD2 / prefix-filtered exact similarity join
    "q_pack_sequences",
    "q_mixture_temperature_sample",
    "q_scd2_history",
    "q_simjoin_pairs",
    "corpus_layout_e2e",
    # round 7 additions: JL projection + recall, join IVM, ER funnel,
    # whole-doc FFD packing, Hilbert locality, dedup-aware sampling,
    # NFC canonicalization
    "q_random_projection",
    "q_rp_ann_recall",
    "q_incremental_join_maintain",
    "q_entity_resolution_e2e",
    "q_ffd_pack_assign",
    "q_hilbert_locality",
    "q_dedup_aware_sampling",
    "q_unicode_nfc",
    # round 9 additions: benchmark decontamination, leakage-safe split,
    # FIM transform, epoch shuffle, PMI collocations, the governance E2E,
    # and the 3-D Hilbert write->skip model
    "corpus_decontam_e2e",
    "q_split_leakage_audit",
    "q_fim_report",
    "q_epoch_shuffle_decorrelation",
    "q_pmi_collocations",
    "corpus_trainsplit_e2e",
    "corpus_layout3_e2e",
    # round 10 additions: pack/epoch composition, Fellegi-Sunter
    # linkage + its E2E, semantic decontamination, bitemporal history
    "corpus_epoch_e2e",
    "q_fs_match_scores",
    "q_probabilistic_linkage_e2e",
    "q_semantic_decontam",
    "q_bitemporal_history",
    # round 11 additions: exact-ANN decontamination twin, selective
    # min/max IVM rescan E2E, dynamic pivot, compacted bitemporal store
    "q_semantic_decontam_ann",
    "q_incremental_minmax_rescan_e2e",
    "q_pivot_dynamic",
    "stream_bitemporal_compacted",
    "dedup_embedding_exact_pairs",
    # round 12 additions: candidate-aware drained exact pair join,
    # folded-store as-of, ANN gate twins (kernel + streaming), the
    # exact near-dup E2E, KMV bottom-k Jaccard
    "dedup_embedding_exact_pairs_drained",
    "stream_btcompact_asof",
    "q_semantic_decontam_ann_kernel",
    "stream_semantic_decontam_gate_ann",
    "corpus_neardup_exact_e2e",
    "q_kmv_jaccard",
    "sim_knn_exact_cells",
    "q_rrf_fusion",
    "stream_knn_exact",
    "dedup_exact_pairs_incremental",
    "q_mmr_rerank",
    "q_feature_corr",
    "q_mutual_information",
    # round 13 additions: drain-firing twin (the refinement loop runs
    # during the timed execution, unlike the 2M-cap row's no-op path),
    # batched multi-query MMR (distributed selected-set state)
    "dedup_embedding_exact_pairs_drained_hot",
    "q_mmr_rerank_multi",
    "q_rrf_fusion_multi",
    "q_pareto_skyline",
    "q_spearman_corr",
    "q_chi_square",
    "q_hll_intersect",
    "q_tfidf_cosine_pairs",
    "q_mad_outliers",
    "q_trimmed_mean",
    "q_groupwise_ols",
    "q_autocorr_daily",
    "q_assoc_rules",
    "stream_pareto_skyline",
    "q_dbscan_clusters",
    "q_gini_spend",
    "q_shannon_entropy",
    "q_zipf_slope",
    "q_benford_digits",
    "stream_assoc_rules",
    "q_l_diversity",
    "q_link_prediction",
    "q3_shipping_priority",
    "q_kaplan_meier",
    "q_psi_drift",
    "q_lorenz_deciles",
    "q_cusum_changepoint",
    "q_ks_test",
    "q4_order_priority",
    "q10_returned_items",
    "q12_priority_shipping",
    "q14_promo_effect",
    "q7_volume_shipping",
    "q18_large_volume_customer",
    "q19_disjunctive_revenue",
    "q22_sales_opportunity",
    "q_mannwhitney_u",
    "q_t_closeness",
    "q_ewma_daily",
    "q_burstiness_fano",
    "q_event_trigrams",
    "q_haar_coeffs",
    "q_kcore_histogram",
    "stream_ewma_daily",
    "q_funnel_within",
    "q_equidepth_bins",
    "q_mode_per_group",
    "q_hard_negatives",
    "q_bounce_rate",
    "q_source_jaccard",
]


# record-integrity knobs (header policy)
_RESTART_EVERY = 20  # extended rows per Spark session
_HEAVY_SECS = 6.0    # first-exec wall above this -> best-of-2


def _calibration(spark) -> float:
    """Best-of-3 wall of a fixed synthetic CPU-bound job: hash + sort
    5M generated rows, sum the result. No repo data, no parquet, no
    Python UDFs — a pure JVM constant that moves only with host speed,
    so any per-query row can be read as (row / calibration) across
    rounds measured on different days."""
    from pyspark.sql import functions as F

    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        (
            spark.range(0, 5_000_000)
            .select((F.col("id") * 2654435761 % 1000003).alias("k"))
            .orderBy("k")
            .agg(F.sum("k"))
            .write.format("noop")
            .mode("overwrite")
            .save()
        )
        best = min(best, time.perf_counter() - t0)
    return round(best, 3)


def _loadavg() -> float | None:
    """1-minute load average — stamped on the record so a bench taken
    on a busy box is self-documenting (VERDICT r9: a loaded-box run
    recorded 2x the idle number for q_simjoin_pairs and a reader of
    the JSON alone couldn't tell)."""
    try:
        with open("/proc/loadavg") as fh:
            return float(fh.read().split()[0])
    except (OSError, ValueError):
        return None


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    spark = get_spark("bench")
    registry = all_queries()

    # warm the JVM + parquet footers once (not timed)
    registry["q1_pricing_summary"].spark(spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()

    # Steady-state wall: best of 3 executions per query. A single cold
    # execution on a shared box is dominated by JIT + planner warm-up and
    # machine noise; the min approximates the throughput a long-running
    # cluster job actually sees. (Raised from 2 to 3 in round 3: r2's
    # text_quality_score "+117%" turned out to be pure box-load noise —
    # idle re-measurement landed back on the r1 number with an unchanged
    # plan fingerprint; one extra rep halves the odds a load spike
    # poisons both samples of a short map-side query.)
    load_start = _loadavg()

    def run_set(
        names: list[str], restart_every: int | None = None
    ) -> tuple[dict[str, float], dict[str, str]]:
        nonlocal spark
        timings: dict[str, float] = {}
        plans: dict[str, str] = {}
        done = 0
        for name in names:
            q = registry.get(name)
            if q is None:
                continue
            if restart_every and done and done % restart_every == 0:
                # session isolation (header policy): a fresh session per
                # _RESTART_EVERY rows keeps accumulated JVM/session state
                # from poisoning individual rows (r12: 3.7× on one row)
                spark.stop()
                spark = get_spark("bench")
                registry["q1_pricing_summary"].spark(
                    spark, sf_dir
                ).write.format("noop").mode("overwrite").save()
            done += 1
            t0 = time.perf_counter()
            df = q.spark(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            best = time.perf_counter() - t0
            # budget rule (header policy): heavy rows best-of-2
            extra_reps = 1 if best > _HEAVY_SECS else 2
            for _ in range(extra_reps):
                t0 = time.perf_counter()
                df = q.spark(spark, sf_dir)
                df.write.format("noop").mode("overwrite").save()
                best = min(best, time.perf_counter() - t0)
            timings[name] = round(best, 3)
            # plan fingerprint: a regression in plan shape (extra shuffle,
            # a broadcast degrading to sort-merge, Python creeping into a
            # hot path) is caught even when ±30% wall-clock noise hides it
            p = spark._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            plans[name] = (
                f"x{p.count(') Exchange')}"
                f"-b{p.count('BroadcastHashJoin')}"
                f"-s{p.count('SortMergeJoin')}"
                f"-py{p.count('EvalPython') + p.count('MapInPandas')}"
            )
        return timings, plans

    calibration = _calibration(spark)
    timings, plans = run_set(HEADLINE)
    ext_timings, ext_plans = run_set(EXTENDED, restart_every=_RESTART_EVERY)
    plans.update(ext_plans)

    # self-reporting plan regressions: diff fingerprints against the most
    # recent recorded round (BENCH_r{N}.json at the repo root) so an extra
    # shuffle / lost broadcast / Python creep shows up in the bench line
    # itself, not only in a manual comparison
    fingerprint_diff = {}
    here = os.path.dirname(os.path.abspath(__file__))
    prior = sorted(
        f for f in os.listdir(here)
        if re.fullmatch(r"BENCH_r\d+\.json", f)
    )
    if prior:
        try:
            with open(os.path.join(here, prior[-1])) as fh:
                rec = json.load(fh)
            old = rec.get("plan_fingerprints")
            if old is None:
                # the driver wraps the bench stdout inside a "tail" string
                # (possibly truncated at the FRONT and with trailing text
                # after the metric line); recover the embedded JSON with
                # raw_decode so trailing output can't abort the parse
                tail = rec.get("tail", "")
                i = tail.rfind('{"metric"')
                if i >= 0:
                    obj, _ = json.JSONDecoder().raw_decode(tail, i)
                    old = obj.get("plan_fingerprints", {})
                else:
                    old = {}
            if not old:
                # tail was truncated (r3 lost its head this way) — fall
                # back to the previous run's full summary file
                last = os.path.join(here, "bench_last.json")
                if os.path.exists(last):
                    with open(last) as fh:
                        old = json.load(fh).get("plan_fingerprints", {})
            if not old:
                print(
                    f"bench: no prior plan fingerprints recoverable from "
                    f"{prior[-1]} or bench_last.json; fingerprint_diff "
                    f"disabled this run",
                    file=sys.stderr,
                )
            fingerprint_diff = {
                q: f"{old[q]}->{fp}"
                for q, fp in plans.items()
                if q in old and old[q] != fp
            }
        except (OSError, ValueError) as e:
            print(
                f"bench: failed to recover prior fingerprints from "
                f"{prior[-1]}: {e}",
                file=sys.stderr,
            )

    total = round(sum(timings.values()), 3)
    # effective parallelism of the session actually used (header policy:
    # lets the driver's $SPARK_GRAFT_CPUS probe verify the contract
    # directly; local[N] -> defaultParallelism == N)
    parallelism = spark.sparkContext.defaultParallelism
    summary = {
        "metric": "headline_queries_total_wall",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "extended_queries": ext_timings,
        "sf": sf,
        "parallelism": parallelism,
        "calibration": calibration,
        "plan_fingerprints": plans,
        "fingerprint_diff": fingerprint_diff,
        "loadavg": {"start": load_start, "end": _loadavg()},
        "notes": {
            "sim_ivf_ann": "r3: assignment became map-side argmax "
            "(x3->x2, no N*k shuffle); at this toy SF (500 vecs) the "
            "per-call centroid collect+expression build adds ~1s of "
            "constant overhead, while at 20x/40x probe scale the new "
            "plan is faster (SCALE.md: 5.3s->4.4s @20x)",
        },
    }
    # the driver records only the (truncatable) stdout tail; persist the
    # full summary beside the repo so every round's numbers survive intact
    with open(os.path.join(here, "bench_last.json"), "w") as fh:
        json.dump(summary, fh, indent=1)
    # the driver's tail capture is ~4 KB: the full summary stopped
    # fitting in round 3 and BENCH_r3-r8 recorded parsed:null. Print a
    # COMPACT final line (totals + per-query seconds only); plan
    # fingerprints, extended rows, and notes live in bench_last.json.
    compact = {
        "metric": summary["metric"],
        "value": summary["value"],
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "extended_total": round(sum(ext_timings.values()), 3),
        "extended_n": len(ext_timings),
        "parallelism": parallelism,
        "calibration": calibration,
        "fingerprint_diff_n": len(fingerprint_diff),
        "load": [load_start, _loadavg()],
        "full": "bench_last.json",
    }
    print(json.dumps(compact))


if __name__ == "__main__":
    main()
