"""Driver-facing query registry.

Each entry demonstrates one operator from SURVEY.md §2 (or a north-star
extension) as a (PySpark callable, DuckDB oracle SQL) pair over the
driver's synthetic tables (TESTDATA.md). The driver runs both at sf0.01
and hash-compares row-count + schema + values (CORRECTNESS_r{N}.json).

Float discipline: aggregates over double columns are computed in DECIMAL
in BOTH engines (exact arithmetic → bit-identical results), then cast to
a fixed decimal type aliased identically on both sides.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession


@dataclass
class Q:
    """One registered query: Spark implementation + DuckDB oracle."""

    spark: Callable[[SparkSession, str], DataFrame]
    oracle: Optional[str]  # None → driver records rows-only check
    doc: str = ""


_REGISTRY: dict[str, Q] = {}


def register(name: str, oracle: Optional[str], doc: str = ""):
    def deco(fn):
        # A duplicate name would SILENTLY shadow the earlier (possibly
        # driver-attested) implementation — the round-10 near-miss: a
        # new CUBE query re-used q_cube_status_priority and replaced
        # the r7-attested row until the registry count caught it. Fail
        # loudly at import instead.
        if name in _REGISTRY:
            raise ValueError(
                f"query name {name!r} already registered "
                f"(by {_REGISTRY[name].spark.__module__}); "
                f"pick a distinct name"
            )
        _REGISTRY[name] = Q(spark=fn, oracle=oracle, doc=doc)
        return fn

    return deco


# The driver's per-round correctness snapshot covers the FIRST 50
# entries in the dict all_queries() returns (r1-r4 windows confirm).
# Since round 5 the window is an EXPLICIT name list (below) and
# all_queries() reorders its output to put those names first — module
# import order no longer encodes the window, so rotating the window is a
# one-list edit and every query module stays byte-identical across
# rounds (the judge verifies attested code via git diff).
#
# FREEZE RULE (adopted round 6, the 9d6c lesson from VERDICT.md r5 #3):
# once the round's WINDOW_R{N} list is committed, the modules backing
# its rows are FROZEN for the round — any behavior change to a
# window-listed query waits for the next round, or must re-declare the
# window in the same commit. Otherwise a mid-round driver snapshot
# races the edit.
#
# CARVE-OUT (adopted round 11, VERDICT r10 "What's wrong" #1): an
# ADVICE/judge-review fix that touches a module backing a
# declared-window row is NOT an exception to the rule — it must land
# IN THE SAME COMMIT as the window declaration (so declaration-to-
# snapshot stays byte-identical), or the window must be re-declared in
# the fix commit. The round-10 fim.py fix landed in the gap between
# declaration and snapshot and only worked out by timing; from round
# 11 on, review fixes to window-backing modules are batched into the
# declaration commit (this round: the fellegi.py GREATEST guard and
# the queries_repeat_budget.py uniq=0 guard, ADVICE r10 #3/#4, both
# value-neutral for every registered query and landed HERE, in the
# WINDOW_R11-declaration commit).
#
# Round-8 window (exactly 50). CORRECTNESS_r07 went 50/50 green, so the
# priority order is purely staleness (never-attested first):
#   1-43  every never-attested round-7 addition (modules queries_rproj
#         through queries_bootstrap) — the VERDICT r7 "What's wrong"
#         items touch operators/ppjoin.py, streaming/stream.py and
#         operators/hamming.py, none of which back a window row
#         (q_simjoin_pairs / stream_hamming_dedup / the in-memory
#         incremental-dedup twin were all attested in r7); round-8
#         additions to Hilbert (N-dim) and IVM (retraction) live in
#         NEW modules so the window-backing files stay byte-identical
#   44-50 the 7 stalest r4 family heads (corpus clean E2E, the three
#         remaining dedup variants, the three remaining LSH/IVF ANN
#         variants) — spreads re-attestation across the biggest
#         remaining r4 families
# Round-9 rotation (DECLARED NOW so staleness stays bounded at <=4
# rounds by construction — VERDICT r7 #2): the 37 remaining r4-stale
# rows, namely
#   s3_scan_project_filter, s4_prefilter_scan, s5_split_by_key_counts,
#   s6_dim_broadcast_join, s7_readback_reprojection,
#   s9_audit_side_output, p02_double_prefix_collapse,
#   p06_conditional_prefix, p07_compound_id_split, p08_alt_id_extract,
#   p09_qualifier_normalize, p10_data_src_substitution,
#   p11_self_ref_filter, p12_gated_field_move, p13_gated_empty_drop,
#   p14_gated_column_clear, p15_date_parse_format,
#   p17_null_safe_helpers, j01_multikey_dispatch_match,
#   q_bloom_prefilter_join, q_bm25_multi, q_bm25_search, q_cms_counts,
#   q_compaction_plan, q_degree_histogram, q_fuzzy_name_pairs,
#   q_gopher_quality, q_hll_registers, q_kmv_distinct,
#   q_range_interval_join, q_repetition_ratio, q_salted_skew_join,
#   q_tfidf_topterms, q_triangle_count, q_two_hop_reach,
#   q_zorder_layout, mm_feature_extract
# plus the freshest round-8 additions to fill the remaining 13 slots
# (never-attested first, as always). After r9 the registry is fully
# drained: every query attested within the last 4 rounds.
#
# WINDOW_R9 below IS that declared rotation, verbatim: the 4
# never-attested round-8 additions first, then the 37 r4-stale rows
# (exactly the list above, in registry/module order), then the 9
# stalest r5 rows (registry order) to fill to 50. Round-8's window is
# kept alongside for provenance (CORRECTNESS_r08 names == WINDOW_R8).
#
# Round-10 rotation (DECLARED NOW, same bounded-staleness discipline):
# the 37 remaining r5-attested rows, namely
#   j12_active_semi_join, a1_source_line_counts, a6_before_after_counts,
#   q5_multiway_join_agg, w3_session_window_native,
#   stream_stateful_sessions, stream_session_window, sim_pq_adc,
#   sim_pq_rerank, sim_ivf_pq, sim_pq_adc_kernel,
#   q_snapshot_diff_counts, q_snapshot_diff_rows, q_hist_quantile_state,
#   q_hist_merge_law, q_hll_merge_law, dedup_incremental,
#   stream_incremental_dedup, q_cluster_canonical, q_langid_trained,
#   q_expectations_report, q_k_anonymity, q_hist_by_source,
#   stream_cms_counters, q_pps_sample, stream_static_enrich,
#   q_value_outliers, q_funnel_ordered, q_orc_roundtrip, q_hll_by_group,
#   q_kmv_merge_law, q_cms_merge_law, q_semdedup_drops,
#   q_semdedup_report, q_pii_redact, corpus_curation_e2e,
#   corpus_refresh_e2e
# plus round-9 additions (never-attested first, as always) to fill the
# remaining 13 slots. Round-9 ledger — the 20 trailing additions, in
# registration order (modules queries_layout3_e2e through
# queries_fertility; the first 13 fill round-10's window, the rest
# lead round-11's):
#   corpus_layout3_e2e, q_decontam_verdicts, q_decontam_report,
#   corpus_decontam_e2e, q_leakage_safe_split, q_split_leakage_audit,
#   q_fim_spans, q_fim_report, q_epoch_shuffle_layout,
#   q_epoch_shuffle_decorrelation, q_pmi_collocations,
#   stream_decontam_gate, corpus_trainsplit_e2e, q_priority_sample,
#   q_priority_sample_audit, q_incremental_min_maintain,
#   q_incremental_min_rescan_audit, q_golden_record,
#   stream_priority_sample, q_tokenizer_fertility
#
# Round-10 ledger — trailing additions in registration order (these
# plus the 7 trailing round-9 additions lead WINDOW_R11, which fills
# out with the then-stalest r6-attested rows):
#   corpus_epoch_e2e, q_fs_field_weights, q_fs_match_scores,
#   q_fs_verdict_report, q_semantic_decontam,
#   q_semantic_decontam_report, q_probabilistic_linkage_e2e,
#   stream_semantic_decontam_gate, q_bitemporal_history,
#   q_bitemporal_asof_history, q_bitemporal_correction_audit,
#   q_epoch_repeat_budget, q_clustering_depth,
#   stream_bitemporal_history, q_incremental_max_maintain,
#   q_cube_grouping_id, q_grouping_sets_mixed,
#   q_pivot_status_by_segment, q_unpivot_roundtrip,
#   stream_dedup_within_watermark, q_quantile_cont_exact
#
# Round-11 rotation (DECLARED NOW, bounded-staleness discipline): the
# 28 never-attested rows above (7 round-9 trailing + 21 round-10, in
# registration order), then the FIRST 22 of the 50 r6-attested rows in
# registry order, namely
#   q_rollup_status_priority, a3_withinfo_consolidate,
#   a4_duplicate_merge, a5_notes_eq_xref_clear, j04_history_resolution,
#   j10_descendant_anti_join, a7_upsert_classification,
#   a8_threshold_guarded_delete, w1_topk_per_group, w2_sessionize,
#   set_ops_except_union, set_array_algebra, pipeline_e2e_mouse,
#   pipeline_e2e_upsert, sim_ivf_trained, dedup_clusters,
#   dedup_embedding_bucketed, dedup_winnowing, text_token_count,
#   text_quality_score, text_lang_id, text_fingerprint
# (the remaining 28 r6 rows — text_ngram_topk through
# q_bpe_merges_batched in registry order — lead WINDOW_R12).
#
# Round-11 ledger — trailing additions in registration order (these
# lead WINDOW_R12 ahead of the 28 remaining r6-attested rows, same
# never-attested-first discipline):
#   q_incremental_minmax_rescan_e2e, q_semantic_decontam_ann,
#   q_semantic_decontam_ann_report, q_pivot_dynamic,
#   stream_bitemporal_compacted, dedup_embedding_exact_pairs
#
# Round-12 rotation (WINDOW_R12 below, the r11-declared composition
# verbatim): the 6 never-attested round-11 trailing additions, then
# the 28 remaining r6-attested rows (text_ngram_topk ..
# q_bpe_merges_batched, registry order), filled to 50 with the 16
# stalest r7-attested rows (dedup_exact .. q_boilerplate_freq,
# registry order). Carve-out compliance: the round's window-backing
# fixes land IN this declaration commit — the three ADVICE r11 items
# (exact-pairs docstring, empty-cells guard in the registered plan,
# probe_cells kernel-path empty guard) plus the two VERDICT r11
# prescriptions on the same modules (capped-SIZE training sample via
# operators/decontam_ann.train_sample, VERDICT "What's wrong" #1; the
# hot-cell drain refine_hot_cells, Next #3; the sample-trained bench
# cells for the ANN gate, Next #7). All are value-neutral for the
# registered results by the lossless-bound argument (cells steer
# pruning, never results) — re-verified against the brute-force
# oracles at sf0.001 and sf0.01 before declaration.
#
# Round-13 rotation (DECLARED NOW, bounded-staleness discipline —
# VERDICT r11 Next #8): round-12 trailing additions (never-attested
# first, registration order) lead WINDOW_R13, then the 34 remaining
# r7-attested rows, namely
#   q_boilerplate_strip, q_ann_recall, q_csv_roundtrip,
#   q_dedup_recall, stream_dsir_score, q_shuffle_shards,
#   corpus_build_e2e, q_lm_perplexity_bucket, q_oov_rate,
#   q_mixture_drift_kl, q_pagerank_topk, dedup_simhash_hamming,
#   mm_phash_neardup, q_hamming_cluster_sizes,
#   q_incremental_agg_maintain, q_interval_overlap_join,
#   stream_hamming_dedup, stream_incremental_agg, q_dupspan_mass,
#   q_dupspan_strip, corpus_substring_e2e, q_pack_doc_spans,
#   q_pack_sequences, q_mixture_temperature,
#   q_mixture_temperature_sample, q_scd2_history, q_scd2_current,
#   q_simjoin_pairs, q_simjoin_prune_stats,
#   q_quality_percentile_by_source, q_quality_top_slice_per_source,
#   q_curriculum_layout, stream_scd2_dimension, corpus_layout_e2e
# (if trailing additions + 34 exceed 50, the r7 tail beyond the cut
# rolls to WINDOW_R14 in the same order; if they undershoot, fill
# with the stalest r8-attested rows in registry order). After r13
# every registered query is again <= 5 rounds stale, and the r8 rows
# become the drain target for r14.
#
# Round-12 ledger — trailing additions in registration order (13; per
# the declaration above these lead WINDOW_R13, followed by the first
# 34 remaining r7-attested rows, filled to 50 with the stalest
# r8-attested rows — 50 - 13 - 34 = 3 of them):
#   dedup_embedding_exact_pairs_drained, stream_btcompact_asof,
#   q_semantic_decontam_ann_kernel, stream_semantic_decontam_gate_ann,
#   corpus_neardup_exact_e2e, q_kmv_jaccard, sim_knn_exact_cells,
#   q_rrf_fusion, stream_knn_exact, dedup_exact_pairs_incremental,
#   q_mmr_rerank, q_feature_corr, q_mutual_information
#
# Round-14 rotation (DECLARED NOW, bounded-staleness discipline —
# VERDICT r12 Next #7): round-13 trailing additions (never-attested
# first, registration order — see the round-13 ledger appended at the
# end of this round) lead WINDOW_R14, filled to 50 with the stalest
# r8-attested rows in registry order, namely (47 remain after the 3
# drained by WINDOW_R13):
#   dedup_embedding_cosine, sim_lsh_ann, sim_ivf_ann,
#   sim_lsh_multitable, q_random_projection, q_rproj_kernel,
#   q_rp_ann_recall, q_rp_rerank, q_incremental_join_maintain,
#   q_delta_join_terms, stream_late_data_audit,
#   q_entity_resolution_e2e, q_entity_blocking_stats, q_unicode_nfc,
#   q_text_canonicalize, q_event_transitions, q_next_event_prediction,
#   q_json_dead_letter_report, q_json_quarantine_rows,
#   q_ffd_pack_assign, q_ffd_pack_stats, q_hilbert_layout,
#   q_hilbert_locality, q_dedup_aware_sampling, q_dedup_aware_report,
#   stream_hll_distinct, stream_json_quarantine,
#   sim_knn_join_bucketed, q_length_bucketing,
#   q_length_bucketing_gain, q_length_bucketing_sketch,
#   corpus_pack_e2e, q_csv_dead_letter, q_budget_waterfill,
#   q_budget_waterfill_audit, q_chunk_overlap, q_join_size_cms,
#   stream_incremental_join, mm_aspect_bucketing,
#   q_bbit_minhash_pairs, q_cohort_retention, q_cohort_sizes,
#   q_erasure_plan, q_rfm_scores, q_rfm_segments, q_negative_samples,
#   q_bootstrap_stats
# (take the first 50 - len(r13 additions) of that list; the tail
# beyond the cut rolls to WINDOW_R15 in the same order). After r14
# the r8 drain is underway with every registered query <= 6 rounds
# stale, fully drained by r15.
#
# Round-13 ledger — trailing additions in registration order (per
# the round-14 declaration above these lead WINDOW_R14, followed by
# the stalest r8-attested rows from the list above, starting at
# dedup_embedding_cosine, filling to 50):
#   dedup_embedding_exact_pairs_drained_hot, q_mmr_rerank_multi,
#   q_rrf_fusion_multi, q_pareto_skyline, q_spearman_corr,
#   q_chi_square, q_hll_intersect, q_tfidf_cosine_pairs,
#   q_mad_outliers, q_trimmed_mean, q_groupwise_ols, q_autocorr_daily,
#   q_assoc_rules, stream_pareto_skyline, q_dbscan_clusters,
#   q_gini_spend, q_shannon_entropy, q_zipf_slope, q_benford_digits,
#   stream_assoc_rules, q_l_diversity, q_link_prediction,
#   q3_shipping_priority, q_kaplan_meier, q_psi_drift,
#   q_lorenz_deciles, q_cusum_changepoint, q_ks_test,
#   q4_order_priority, q10_returned_items, q12_priority_shipping,
#   q14_promo_effect, q7_volume_shipping, q18_large_volume_customer,
#   q19_disjunctive_revenue, q22_sales_opportunity, q_mannwhitney_u,
#   q_t_closeness, q_ewma_daily, q_burstiness_fano, q_event_trigrams,
#   q_haar_coeffs, q_kcore_histogram, stream_ewma_daily,
#   q_funnel_within, q_equidepth_bins, q_mode_per_group,
#   q_hard_negatives, q_bounce_rate, q_source_jaccard
# (50 total; the r8 fill is the first 50 - 50 = 0 rows of the list
# above. If further round-13 additions land after this ledger entry
# they append in registration order and the r8 fill shrinks
# accordingly, same rule as every prior round).
#
# END-OF-ROUND-13 CONFIRMATION: the trailing additions landed at
# EXACTLY 50, so WINDOW_R14 is the 50 round-13 additions verbatim and
# the r8 drain (47 rows, dedup_embedding_cosine .. q_bootstrap_stats
# in the round-14 declaration above) rolls INTACT to WINDOW_R15 —
# registered additions were deliberately capped here for that reason
# (a 51st would have pushed a never-attested round-13 row to r15 as
# well). Consequence for the bounded-staleness ledger: the r8 rows
# reach 7-rounds stale at r15 instead of the declared 6 at r14; all
# 47 were sweep-verified at sf0.01 this round on byte-identical
# modules, and WINDOW_R15 MUST lead with them (before any round-14
# additions) to drain the backlog in one window (47 + 3 slots for
# the stalest r9 rows).
#
# Round-9 deferrals (freeze rule): two ADVICE r8 items land in
# round 10 because their modules back WINDOW_R9 rows and the driver
# may snapshot at any time — (a) `bits >= 2` validation in
# operators/hilbert_nd.with_hilbert_key_nd / sql_hilbert_nd_ctes
# (bits=1 raises an opaque IndexError today; registered queries use
# bits=6), and (b) the ivm_retract.read_view_net clean-drain caveat
# (document, or filter view partitions against committed admit ids).
# Both are additive/no-behavior-change for the attested queries, but
# byte-identical window modules beat a low-priority lint fix.
WINDOW_R8 = [
    # -- never-attested round-7 additions (43) --
    "q_random_projection",
    "q_rproj_kernel",
    "q_rp_ann_recall",
    "q_rp_rerank",
    "q_incremental_join_maintain",
    "q_delta_join_terms",
    "stream_late_data_audit",
    "q_entity_resolution_e2e",
    "q_entity_blocking_stats",
    "q_unicode_nfc",
    "q_text_canonicalize",
    "q_event_transitions",
    "q_next_event_prediction",
    "q_json_dead_letter_report",
    "q_json_quarantine_rows",
    "q_ffd_pack_assign",
    "q_ffd_pack_stats",
    "q_hilbert_layout",
    "q_hilbert_locality",
    "q_dedup_aware_sampling",
    "q_dedup_aware_report",
    "stream_hll_distinct",
    "stream_json_quarantine",
    "sim_knn_join_bucketed",
    "q_length_bucketing",
    "q_length_bucketing_gain",
    "q_length_bucketing_sketch",
    "corpus_pack_e2e",
    "q_csv_dead_letter",
    "q_budget_waterfill",
    "q_budget_waterfill_audit",
    "q_chunk_overlap",
    "q_join_size_cms",
    "stream_incremental_join",
    "mm_aspect_bucketing",
    "q_bbit_minhash_pairs",
    "q_cohort_retention",
    "q_cohort_sizes",
    "q_erasure_plan",
    "q_rfm_scores",
    "q_rfm_segments",
    "q_negative_samples",
    "q_bootstrap_stats",
    # -- 7 stalest r4 family heads --
    "corpus_clean_pipeline",
    "dedup_simhash",
    "dedup_ngram_jaccard",
    "dedup_embedding_cosine",
    "sim_lsh_ann",
    "sim_ivf_ann",
    "sim_lsh_multitable",
]

WINDOW_R9 = [
    # -- never-attested round-8 additions (4) --
    "q_hilbert3_layout",
    "q_hilbert3_locality",
    "q_join_view_retract",
    "stream_join_view_retract",
    # -- the 37 r4-stale rows (last attested in CORRECTNESS_r04) --
    "mm_feature_extract",
    "q_salted_skew_join",
    "q_tfidf_topterms",
    "q_bm25_search",
    "q_bm25_multi",
    "q_fuzzy_name_pairs",
    "q_hll_registers",
    "q_kmv_distinct",
    "q_cms_counts",
    "q_range_interval_join",
    "q_bloom_prefilter_join",
    "q_gopher_quality",
    "q_repetition_ratio",
    "q_triangle_count",
    "q_two_hop_reach",
    "q_degree_histogram",
    "q_zorder_layout",
    "q_compaction_plan",
    "s3_scan_project_filter",
    "s4_prefilter_scan",
    "s5_split_by_key_counts",
    "s6_dim_broadcast_join",
    "s7_readback_reprojection",
    "s9_audit_side_output",
    "p02_double_prefix_collapse",
    "p06_conditional_prefix",
    "p07_compound_id_split",
    "p08_alt_id_extract",
    "p09_qualifier_normalize",
    "p10_data_src_substitution",
    "p11_self_ref_filter",
    "p12_gated_field_move",
    "p13_gated_empty_drop",
    "p14_gated_column_clear",
    "p15_date_parse_format",
    "p17_null_safe_helpers",
    "j01_multikey_dispatch_match",
    # -- the 9 stalest r5 rows (registry order) to fill to 50 --
    "stream_tumbling_agg",
    "j02_fallback_cascade",
    "j05_post_match_guard",
    "j06_two_hop_edge_join",
    "j07_evidence_gate",
    "a2_rejected_code_counts",
    "j08_lookup_with_null_audit",
    "j09_exclusion_anti_join",
    "j11_nullsafe_key_match",
]

# WINDOW_R10 below is the round-9-declared rotation, verbatim (see the
# header ledger): the 37 remaining r5-attested rows in registry/module
# order, then the first 13 round-9 trailing additions (never-attested
# first, as always). The trailing 7 round-9 additions
# (q_priority_sample … q_tokenizer_fertility) plus round-10's own
# additions lead WINDOW_R11, filled out with the then-stalest (r6) rows.
#
# Round-10 freeze note: ADVICE r9 prescribed two fixes to modules that
# back WINDOW_R10 rows — operators/fim.py (text_col honored in the cut
# draw + NULL-text coalesce; q_fim_spans / q_fim_report) and, for
# round-11 rows, operators/incragg_minmax.py (sticky exhaustion).
# Both landed at the START of round 10, BEFORE any attestation runs,
# and both are value-neutral for every registered query (non-null
# default-column inputs; re-verified against the DuckDB oracles at
# sf0.01 on landing). The modules are frozen from that commit to the
# driver snapshot.
WINDOW_R10 = [
    # -- the 37 remaining r5-attested rows (registry/module order) --
    "j12_active_semi_join",
    "a1_source_line_counts",
    "a6_before_after_counts",
    "q5_multiway_join_agg",
    "w3_session_window_native",
    "stream_stateful_sessions",
    "stream_session_window",
    "sim_pq_adc",
    "sim_pq_rerank",
    "sim_ivf_pq",
    "sim_pq_adc_kernel",
    "q_snapshot_diff_counts",
    "q_snapshot_diff_rows",
    "q_hist_quantile_state",
    "q_hist_merge_law",
    "q_hll_merge_law",
    "dedup_incremental",
    "stream_incremental_dedup",
    "q_cluster_canonical",
    "q_langid_trained",
    "q_expectations_report",
    "q_k_anonymity",
    "q_hist_by_source",
    "stream_cms_counters",
    "q_pps_sample",
    "stream_static_enrich",
    "q_value_outliers",
    "q_funnel_ordered",
    "q_orc_roundtrip",
    "q_hll_by_group",
    "q_kmv_merge_law",
    "q_cms_merge_law",
    "q_semdedup_drops",
    "q_semdedup_report",
    "q_pii_redact",
    "corpus_curation_e2e",
    "corpus_refresh_e2e",
    # -- the first 13 round-9 trailing additions (registration order) --
    "corpus_layout3_e2e",
    "q_decontam_verdicts",
    "q_decontam_report",
    "corpus_decontam_e2e",
    "q_leakage_safe_split",
    "q_split_leakage_audit",
    "q_fim_spans",
    "q_fim_report",
    "q_epoch_shuffle_layout",
    "q_epoch_shuffle_decorrelation",
    "q_pmi_collocations",
    "stream_decontam_gate",
    "corpus_trainsplit_e2e",
]

# WINDOW_R11 below is the round-10-declared rotation, verbatim (ledger
# above): the 28 never-attested rows (7 round-9 trailing + 21
# round-10, registration order), then the first 22 of the 50
# r6-attested rows in registry order — the reference's
# consolidation/merge/upsert/closure spine (A3/A4/A5/A7/A8/J4/J10,
# both pipeline E2Es) re-attested on current code.
WINDOW_R11 = [
    # -- round-9 trailing additions (7, registration order) --
    "q_priority_sample",
    "q_priority_sample_audit",
    "q_incremental_min_maintain",
    "q_incremental_min_rescan_audit",
    "q_golden_record",
    "stream_priority_sample",
    "q_tokenizer_fertility",
    # -- round-10 additions (21, registration order) --
    "corpus_epoch_e2e",
    "q_fs_field_weights",
    "q_fs_match_scores",
    "q_fs_verdict_report",
    "q_semantic_decontam",
    "q_semantic_decontam_report",
    "q_probabilistic_linkage_e2e",
    "stream_semantic_decontam_gate",
    "q_bitemporal_history",
    "q_bitemporal_asof_history",
    "q_bitemporal_correction_audit",
    "q_epoch_repeat_budget",
    "q_clustering_depth",
    "stream_bitemporal_history",
    "q_incremental_max_maintain",
    "q_cube_grouping_id",
    "q_grouping_sets_mixed",
    "q_pivot_status_by_segment",
    "q_unpivot_roundtrip",
    "stream_dedup_within_watermark",
    "q_quantile_cont_exact",
    # -- the 22 stalest r6-attested rows (registry order) --
    "q_rollup_status_priority",
    "a3_withinfo_consolidate",
    "a4_duplicate_merge",
    "a5_notes_eq_xref_clear",
    "j04_history_resolution",
    "j10_descendant_anti_join",
    "a7_upsert_classification",
    "a8_threshold_guarded_delete",
    "w1_topk_per_group",
    "w2_sessionize",
    "set_ops_except_union",
    "set_array_algebra",
    "pipeline_e2e_mouse",
    "pipeline_e2e_upsert",
    "sim_ivf_trained",
    "dedup_clusters",
    "dedup_embedding_bucketed",
    "dedup_winnowing",
    "text_token_count",
    "text_quality_score",
    "text_lang_id",
    "text_fingerprint",
]

# WINDOW_R12 is the round-11-declared rotation, verbatim (ledger
# above): 6 never-attested round-11 trailing additions, the 28
# remaining r6-attested rows, the 16 stalest r7-attested rows.
WINDOW_R12 = [
    # -- round-11 trailing additions (6, registration order) --
    "q_incremental_minmax_rescan_e2e",
    "q_semantic_decontam_ann",
    "q_semantic_decontam_ann_report",
    "q_pivot_dynamic",
    "stream_bitemporal_compacted",
    "dedup_embedding_exact_pairs",
    # -- the 28 remaining r6-attested rows (registry order) --
    "text_ngram_topk",
    "stream_interval_join",
    "stream_dedup_keys",
    "stream_synthetic_agg",
    "stream_e2e_upsert",
    "mm_binary_decode",
    "mm_frame_sample",
    "q_asof_attribution",
    "q_percentile_disc",
    "q_pivot_event_counts",
    "q_json_extract",
    "q_skew_salted_tokens",
    "q_train_test_split",
    "q_quota_sample",
    "q_doc_chunking",
    "q_global_topk",
    "q_range_window_count",
    "q_sequence_packing",
    "q_mixture_weighted",
    "q_chunk_dedup",
    "q_jsonl_roundtrip",
    "q_cluster_safe_split",
    "q_contamination_13gram",
    "q_rare_token_ratio",
    "q_bpe_merges",
    "q_bpe_token_freqs",
    "q_pii_report",
    "q_bpe_merges_batched",
    # -- the 16 stalest r7-attested rows (registry order) --
    "dedup_exact",
    "dedup_minhash_lsh",
    "sim_topk_bruteforce",
    "stream_sliding_agg",
    "q1_pricing_summary",
    "sim_ivf_trained_kernel",
    "dedup_clusters_minlabel",
    "dedup_embedding_bucketed_kernel",
    "mm_resize",
    "q_cube_status_priority",
    "q_scalar_subquery",
    "q_multi_distinct",
    "q_dsir_bucket_weights",
    "q_dsir_scores",
    "q_dsir_select",
    "q_boilerplate_freq",
]

# WINDOW_R13 is the round-12-declared rotation, verbatim (ledger
# above): the 13 never-attested round-12 trailing additions, the 34
# remaining r7-attested rows, filled to 50 with the 3 stalest
# r8-attested rows in registry order. Carve-out compliance: the
# round's window-backing fixes land IN this declaration commit —
# the two VERDICT r12 "What's wrong #1" items (corpus-sized
# unpartitioned row_number() windows in queries_rrf_fusion.py and
# queries_mmr.py replaced by the repo's own orderBy().limit(K) +
# K-row-rank pattern, operators/retrieval.py:164-166 — value-neutral:
# deterministic tiebreaks were already in place) plus the four ADVICE
# r12 items (empty-qrow guards in queries_mmr.py / queries_rrf_fusion.py
# mirroring each oracle's empty-query behavior; CASE WHEN zero-guard on
# both engines' fixed-point divisions in queries_kmv_jaccard.py;
# refine_hot_cells single-member-sample + no-progress early exit in
# operators/decontam_ann.py matching drain_saturated_cells; dead
# `extra` parameter removed from queries_dedup_exact_incr._pairs).
# All re-verified against the oracles at sf0.001 and sf0.01 before
# declaration.
WINDOW_R13 = [
    # -- round-12 trailing additions (13, registration order) --
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
    # -- the 34 remaining r7-attested rows (registry order) --
    "q_boilerplate_strip",
    "q_ann_recall",
    "q_csv_roundtrip",
    "q_dedup_recall",
    "stream_dsir_score",
    "q_shuffle_shards",
    "corpus_build_e2e",
    "q_lm_perplexity_bucket",
    "q_oov_rate",
    "q_mixture_drift_kl",
    "q_pagerank_topk",
    "dedup_simhash_hamming",
    "mm_phash_neardup",
    "q_hamming_cluster_sizes",
    "q_incremental_agg_maintain",
    "q_interval_overlap_join",
    "stream_hamming_dedup",
    "stream_incremental_agg",
    "q_dupspan_mass",
    "q_dupspan_strip",
    "corpus_substring_e2e",
    "q_pack_doc_spans",
    "q_pack_sequences",
    "q_mixture_temperature",
    "q_mixture_temperature_sample",
    "q_scd2_history",
    "q_scd2_current",
    "q_simjoin_pairs",
    "q_simjoin_prune_stats",
    "q_quality_percentile_by_source",
    "q_quality_top_slice_per_source",
    "q_curriculum_layout",
    "stream_scd2_dimension",
    "corpus_layout_e2e",
    # -- the 3 stalest r8-attested rows (registry order) --
    "corpus_clean_pipeline",
    "dedup_simhash",
    "dedup_ngram_jaccard",
]

# A rotation edit that drops or duplicates a name would silently shift
# which queries fall inside the attested first-50 window — assert shape
# at import time, not just membership (ADVICE.md r5).
assert len(WINDOW_R9) == 50 == len(set(WINDOW_R9)), (
    f"WINDOW_R9 must be exactly 50 unique names, got "
    f"{len(WINDOW_R9)} / {len(set(WINDOW_R9))} unique"
)
assert len(WINDOW_R10) == 50 == len(set(WINDOW_R10)), (
    f"WINDOW_R10 must be exactly 50 unique names, got "
    f"{len(WINDOW_R10)} / {len(set(WINDOW_R10))} unique"
)
assert len(WINDOW_R11) == 50 == len(set(WINDOW_R11)), (
    f"WINDOW_R11 must be exactly 50 unique names, got "
    f"{len(WINDOW_R11)} / {len(set(WINDOW_R11))} unique"
)
assert len(WINDOW_R12) == 50 == len(set(WINDOW_R12)), (
    f"WINDOW_R12 must be exactly 50 unique names, got "
    f"{len(WINDOW_R12)} / {len(set(WINDOW_R12))} unique"
)
assert len(WINDOW_R13) == 50 == len(set(WINDOW_R13)), (
    f"WINDOW_R13 must be exactly 50 unique names, got "
    f"{len(WINDOW_R13)} / {len(set(WINDOW_R13))} unique"
)
# The two halves of the rotation must not overlap with each other's
# provenance claim: every R11 name is either a never-attested
# round-9/10 trailing addition or an r6-stale row, never an R10 row.
assert not set(WINDOW_R11) & set(WINDOW_R10), (
    "WINDOW_R11 must be disjoint from WINDOW_R10 (bounded staleness)"
)
assert not set(WINDOW_R12) & set(WINDOW_R11), (
    "WINDOW_R12 must be disjoint from WINDOW_R11 (bounded staleness)"
)
assert not set(WINDOW_R13) & set(WINDOW_R12), (
    "WINDOW_R13 must be disjoint from WINDOW_R12 (bounded staleness)"
)

# DECLARED for round 14 — NOT yet used by all_queries(): the driver's
# round-13 snapshot must still see WINDOW_R13 first. The round-14
# declaration commit activates this list (swap the name in
# all_queries' ordering). Materialized as DATA now because the
# round-13 ledger closed at exactly 50 trailing additions, so the
# entire next window is known and a transcription error next round
# would silently attest the wrong rows; all_queries() cross-checks
# this list against the registry's actual trailing 50 at import.
WINDOW_R14_DECLARED = [
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
assert len(WINDOW_R14_DECLARED) == 50 == len(set(WINDOW_R14_DECLARED)), (
    "WINDOW_R14_DECLARED must be exactly 50 unique names"
)
assert not set(WINDOW_R14_DECLARED) & set(WINDOW_R13), (
    "WINDOW_R14_DECLARED must be disjoint from WINDOW_R13"
)


def all_queries() -> dict[str, Q]:
    # Import side-effect populates the registry. Shared SQL fragments
    # live in shared_sql.py (never registers), so no module import drags
    # another registering module in early. Output order: WINDOW_R13
    # first, then every other registered query in module/definition
    # order (the driver attests the first 50 = exactly WINDOW_R13).
    from . import (  # noqa: F401
        queries_r4_fixes,
        queries_retrieval,
        queries_dedup_attested,
        queries_similarity_ann,
        queries_sketches,
        queries_joins,
        queries_quality,
        queries_graph,
        queries_layout,
        queries_streaming_sliding,
        queries_relational,
        queries_consolidate,
        queries_closure,
        queries_upsert,
        queries_window,
        queries_pipeline,
        queries_similarity,
        queries_dedup,
        queries_text,
        queries_streaming,
        queries_multimodal,
        queries_analytics,
        queries_sampling,
        queries_curation,
        # round-4 additions, modules similarity_pq through
        # queries_refresh_e2e (import position no longer matters for
        # the window — WINDOW_R8 reorders explicitly)
        queries_similarity_pq,
        queries_diff,
        queries_sketches_hist,
        queries_dedup_incremental,
        queries_quality_rare,
        queries_streaming_incdedup,
        queries_bpe,
        queries_curation_canonical,
        queries_langid,
        queries_validation,
        queries_streaming_cms,
        queries_sampling_pps,
        queries_streaming_enrich,
        queries_analytics_r4,
        queries_sinks_r4,
        queries_semdedup,
        queries_pii,
        queries_corpus_e2e,
        queries_refresh_e2e,
        # round-5 additions (attested green in round 6)
        queries_bpe_batched,
        # round-6 additions (all 38 never-attested rows lead WINDOW_R8)
        queries_dsir,
        queries_boilerplate,
        queries_ann_recall,
        queries_formats_r6,
        queries_dedup_recall,
        queries_streaming_dsir,
        queries_shards,
        queries_build_e2e,
        queries_lmquality,
        queries_graphrank,
        queries_hamming,
        queries_incragg,
        queries_intervals,
        queries_streaming_r6c,
        queries_dupspan,
        queries_substring_e2e,
        queries_packing,
        queries_mixture,
        queries_scd,
        queries_ppjoin,
        queries_calibrate,
        queries_streaming_scd,
        queries_layout_e2e,
        # round-7 additions (after the window; lead the round-8
        # rotation together with the r4-stale tail listed above)
        queries_rproj,
        queries_incrjoin,
        queries_streaming_late,
        queries_entity_e2e,
        queries_textnorm,
        queries_transitions,
        queries_deadletter,
        queries_binpack,
        queries_hilbert,
        queries_dedupaware,
        queries_streaming_hll,
        queries_streaming_deadletter,
        queries_knnjoin,
        queries_lengthbucket,
        queries_pack_e2e,
        queries_csv_deadletter,
        queries_budget,
        queries_chunk_overlap,
        queries_joinsize,
        queries_streaming_incrjoin,
        queries_mm_aspect,
        queries_bbit,
        queries_cohort,
        queries_erasure,
        queries_rfm,
        queries_negatives,
        queries_bootstrap,
        # round-8 additions (after the window; round-9 rotation fill)
        queries_hilbert3,
        queries_ivm_retract,
        # round-9 additions (after WINDOW_R9; round-10 rotation fill)
        queries_layout3_e2e,
        queries_decontam,
        queries_split,
        queries_fim,
        queries_epochshuffle,
        queries_pmi,
        queries_streaming_decontam,
        queries_trainsplit_e2e,
        queries_priority,
        queries_minmax_ivm,
        queries_survivorship,
        queries_streaming_priority,
        queries_fertility,
        # round-10 additions (after WINDOW_R10; lead the round-11
        # rotation together with the 7 trailing round-9 additions)
        queries_epoch_e2e,
        queries_fellegi,
        queries_semantic_decontam,
        queries_linkage_e2e,
        queries_streaming_semdecontam,
        queries_bitemporal,
        queries_repeat_budget,
        queries_clustering_depth,
        queries_streaming_bitemporal,
        queries_max_ivm,
        queries_cube,
        queries_pivot,
        queries_streaming_wmdedup,
        queries_quantile_exact,
        # round-11 additions (after WINDOW_R11; lead the round-12
        # rotation together with the 28 remaining r6-attested rows)
        queries_minmax_rescan,
        queries_semantic_decontam_ann,
        queries_pivot_dynamic,
        queries_streaming_btcompact,
        queries_dedup_exact_cells,
        # round-12 additions (after WINDOW_R12; lead the round-13
        # rotation per the ledger above)
        queries_dedup_exact_cells2,
        queries_streaming_btcompact2,
        queries_semantic_decontam_ann2,
        queries_streaming_semdecontam2,
        queries_neardup_exact_e2e,
        queries_kmv_jaccard,
        queries_knn_exact,
        queries_rrf_fusion,
        queries_streaming_knn,
        queries_dedup_exact_incr,
        queries_mmr,
        queries_stats_assoc,
        # round-13 additions (after WINDOW_R13; lead the round-14
        # rotation per the ledger above)
        queries_dedup_exact_cells3,
        queries_mmr_multi,
        queries_rrf_multi,
        queries_skyline,
        queries_stats_rank,
        queries_hll_intersect,
        queries_tfidf_pairs,
        queries_robust_stats,
        queries_regression,
        queries_assoc_rules,
        queries_streaming_skyline,
        queries_dbscan,
        queries_inequality,
        queries_zipf,
        queries_benford,
        queries_streaming_assoc,
        queries_l_diversity,
        queries_linkpred,
        queries_tpch_q3,
        queries_survival,
        queries_psi,
        queries_lorenz,
        queries_monitoring,
        queries_tpch_suite,
        queries_tpch_suite2,
        queries_privacy2,
        queries_timeseries2,
        queries_sequences2,
        queries_kcore,
        queries_streaming_ewma,
        queries_analytics2,
        queries_hardneg,
        queries_sessions2,
        queries_srcsim,
    )

    missing = [n for n in WINDOW_R13 if n not in _REGISTRY]
    if missing:  # a rotation typo must fail loudly, not shrink the window
        raise KeyError(f"WINDOW_R13 names not in registry: {missing}")
    ordered = {n: _REGISTRY[n] for n in WINDOW_R13}
    ordered.update((n, q) for n, q in _REGISTRY.items() if n not in ordered)
    # the declared round-14 window must be EXACTLY the round-13
    # trailing additions in canonical order — a drifted declaration
    # would attest the wrong rows next round. The expected sequence is
    # rebuilt from the round-13 MODULE list (not from _REGISTRY dict
    # order): a test importing any plans module before all_queries()
    # interleaves registration order process-wide, while per-module
    # registration order is always source order (a module's top-level
    # runs exactly once, atomically) — so module-anchored
    # reconstruction is import-order-proof where `list(ordered)[-50:]`
    # was not (r13-opt fix: the dict-order form failed under pytest
    # because earlier tests import plan modules directly).
    _r13_mods = [
        m.__name__.rsplit(".", 1)[-1]
        for m in (
            queries_dedup_exact_cells3, queries_mmr_multi,
            queries_rrf_multi, queries_skyline, queries_stats_rank,
            queries_hll_intersect, queries_tfidf_pairs,
            queries_robust_stats, queries_regression,
            queries_assoc_rules, queries_streaming_skyline,
            queries_dbscan, queries_inequality, queries_zipf,
            queries_benford, queries_streaming_assoc,
            queries_l_diversity, queries_linkpred, queries_tpch_q3,
            queries_survival, queries_psi, queries_lorenz,
            queries_monitoring, queries_tpch_suite,
            queries_tpch_suite2, queries_privacy2,
            queries_timeseries2, queries_sequences2, queries_kcore,
            queries_streaming_ewma, queries_analytics2,
            queries_hardneg, queries_sessions2, queries_srcsim,
        )
    ]
    tail = [
        n
        for m in _r13_mods
        for n, q in _REGISTRY.items()
        if q.spark.__module__.rsplit(".", 1)[-1] == m
    ]
    if tail != WINDOW_R14_DECLARED:
        raise AssertionError(
            "WINDOW_R14_DECLARED drifted from the round-13 trailing "
            f"additions: expected {tail[:3]}..., declared "
            f"{WINDOW_R14_DECLARED[:3]}..."
        )
    return ordered
