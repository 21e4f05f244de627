"""Physical-plan audits (the '.explain and iterate' discipline, kept
honest in CI): filters reach the parquet scan, small dimensions
broadcast, hot paths stay JVM-side, and projection pruning holds."""

from __future__ import annotations

import pytest

from go_nonrat_annotation_pipeline_spark.plans.registry import all_queries

SF = "/root/testdata/sf0.001"


def plan(df, mode: str = "formatted") -> str:
    sess = df.sparkSession
    return sess._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), mode)


@pytest.fixture(scope="module")
def registry():
    return all_queries()


def test_scan_pushdown_and_pruning(spark, registry):
    """q1: the date filter is pushed into the parquet scan and unused
    wide columns (l_comment) are pruned from ReadSchema."""
    p = plan(registry["q1_pricing_summary"].spark(spark, SF))
    assert "PushedFilters: [" in p
    assert "IsNotNull(l_shipdate)" in p or "LessThanOrEqual(l_shipdate" in p
    assert "l_comment" not in p


def test_dimension_joins_broadcast(spark, registry):
    """j01 dispatch join: the xdb/gene dimension side must broadcast —
    no shuffle of the fact side on a dimension join."""
    p = plan(registry["j01_multikey_dispatch_match"].spark(spark, SF))
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p


def test_anti_join_strategy(spark, registry):
    """j09 exclusion: anti join against the small exclusion set stays a
    broadcast hash join."""
    p = plan(registry["j09_exclusion_anti_join"].spark(spark, SF))
    assert "BroadcastHashJoin" in p


def test_no_python_in_hot_paths(spark, registry):
    """Dedup/similarity/text kernels are JVM-side: no row-at-a-time or
    Arrow Python UDF nodes in their plans."""
    for name in (
        "dedup_minhash_lsh",
        "dedup_exact",
        "sim_topk_bruteforce",
        "text_quality_score",
        "text_fingerprint",
    ):
        p = plan(registry[name].spark(spark, SF))
        assert "BatchEvalPython" not in p, name
        assert "ArrowEvalPython" not in p, name


def test_multimodal_uses_arrow_batches(spark, registry):
    """Multimodal decode is the sanctioned Python path — mapInPandas
    (Arrow batches), never row-at-a-time BatchEvalPython."""
    p = plan(registry["mm_binary_decode"].spark(spark, SF))
    assert "MapInPandas" in p
    assert "BatchEvalPython" not in p


def test_single_shuffle_aggregation(spark, registry):
    """q1 compiles to partial + final hash aggregate around exactly one
    exchange — no redundant shuffles."""
    p = plan(registry["q1_pricing_summary"].spark(spark, SF))
    # formatted mode lists each node once in the tree and once in the
    # detail section — one physical Exchange node ⇒ exactly one "(n) Exchange"
    assert p.count(") Exchange") == 1
    assert "partial_sum" in p and "HashAggregate" in p


def test_multiway_join_broadcast_chain(spark, registry):
    """q5: all four dimension joins broadcast; the fact side reaches the
    final group-by through a single exchange."""
    p = plan(registry["q5_multiway_join_agg"].spark(spark, SF))
    assert "SortMergeJoin" not in p
    assert p.count("BroadcastHashJoin") >= 4


def test_rollup_single_aggregate_pass(spark, registry):
    """ROLLUP grouping sets expand map-side — one shuffle, no join."""
    p = plan(registry["q_rollup_status_priority"].spark(spark, SF))
    assert "Expand" in p
    assert p.count("Exchange") <= 2  # pre/post-agg exchange only


def test_asof_join_single_shuffle(spark, registry):
    """As-of join (union-window form): exactly one exchange — the
    hash-partition on the key — and no join node at all."""
    p = plan(registry["q_asof_attribution"].spark(spark, SF))
    assert "SortMergeJoin" not in p and "BroadcastHashJoin" not in p
    assert "Window" in p and "hashpartitioning" in p
    # one exchange for the union-window pass, at most one more for the
    # clicks-side (key, ts) dedup aggregate (formatted mode prints each
    # node once in the tree and once as "(N) Exchange" in the details)
    assert p.count(") Exchange") <= 2


def test_global_topk_no_full_sort(spark, registry):
    """orderBy+limit must compile to TakeOrderedAndProject (per-partition
    heaps), never a global Sort + Exchange rangepartitioning."""
    p = plan(registry["q_global_topk"].spark(spark, SF))
    assert "TakeOrderedAndProject" in p
    assert "rangepartitioning" not in p


def test_chunking_stays_jvm_side(spark, registry):
    """explode(sequence) chunking: a Generate node, zero exchanges, no
    Python evaluation."""
    p = plan(registry["q_doc_chunking"].spark(spark, SF))
    assert "Generate" in p and "explode" in p
    assert "Exchange" not in p
    assert "EvalPython" not in p


def test_train_test_split_map_side(spark, registry):
    """Hash split is a pure projection before the single aggregate
    shuffle — one exchange total."""
    p = plan(registry["q_train_test_split"].spark(spark, SF))
    assert p.count(") Exchange") == 1


def test_salted_join_no_single_partition(spark, registry):
    """Salted skew join: no single-partition exchange anywhere, and the
    join key carries the salt column."""
    p = plan(registry["q_salted_skew_join"].spark(spark, SF))
    assert "SinglePartition" not in p
    assert "_salt" in p


def test_split_sink_partition_pruning(spark, tmp_path):
    """S5 split sink: reading one species back hits only that hive
    partition — PartitionFilters in the scan, other partitions pruned."""
    df = spark.createDataFrame(
        [(i, i % 3 + 1, f"line{i}") for i in range(60)],
        "row_id long, species_type_key int, payload string",
    )
    path = str(tmp_path / "split")
    df.write.mode("overwrite").partitionBy("species_type_key").parquet(path)
    rd = spark.read.parquet(path).where("species_type_key = 2")
    p = plan(rd)
    assert "PartitionFilters: [isnotnull(species_type_key" in p
    assert rd.count() == 20


def test_multi_distinct_single_expand_pass(spark, registry):
    """Two COUNT(DISTINCT) + COUNT(*) compile to one Expand-based
    aggregate chain, not three scans of the table."""
    p = plan(registry["q_multi_distinct"].spark(spark, SF))
    assert "Expand" in p
    assert p.count(") Scan parquet") == 1


def test_scalar_subquery_broadcasts_one_row(spark, registry):
    """The global-aggregate threshold joins as a broadcast of the 1-row
    side — the fact table is scanned twice (agg + filter) but never
    shuffled for the join."""
    p = plan(registry["q_scalar_subquery"].spark(spark, SF))
    assert "BroadcastNestedLoopJoin" in p or "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p


def test_ivf_assignment_is_map_side(spark, registry):
    """Corpus→cell assignment folds the collected centroids into a
    map-side argmax column (operators/similarity.argmax_cell): the plan
    must contain NO window over the corpus (the old crossJoin +
    row_number form shuffled all N×k scored rows). The remaining two
    windows are probe selection and final ranking — query-side and
    candidate-bounded respectively. (The one BroadcastNestedLoopJoin is
    the tiny queries × centroids probe cross join.)"""
    import re

    p = plan(registry["sim_ivf_ann"].spark(spark, SF))
    # details section prints one "(n) Window" line per node; bare
    # .count("Window") would also match WindowGroupLimit
    assert len(re.findall(r"^\(\d+\) Window$", p, re.M)) == 2, p


def test_expectations_referential_join_broadcasts_dim(spark, registry):
    """The referential-integrity rule joins the customer dim via
    broadcast — the fact side never shuffles."""
    p = plan(registry["q_expectations_report"].spark(spark, SF))
    assert "BroadcastHashJoin" in p


def test_langid_profile_join_broadcasts(spark, registry):
    """The trained profile is bounded (top_k × languages), so the
    classification join broadcasts it; no shuffle on the doc-bigram
    side before the join."""
    p = plan(registry["q_langid_trained"].spark(spark, SF))
    assert "BroadcastHashJoin" in p


def test_funnel_single_aggregate_pass(spark, registry):
    """Funnel stages come from ONE pass of conditional aggregates —
    no self-joins of the fact table."""
    p = plan(registry["q_funnel_ordered"].spark(spark, SF))
    assert "Join" not in p
    # two hash aggregates (per-user stages, then the global roll-up)
    assert p.count(") HashAggregate") >= 2


def test_outliers_stats_join_broadcasts(spark, registry):
    """The 5-row per-type stats table broadcasts back onto the events
    scan; detection itself is decimal arithmetic in codegen."""
    p = plan(registry["q_value_outliers"].spark(spark, SF))
    assert "BroadcastHashJoin" in p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p


def test_hist_bins_single_shuffle(spark, registry):
    """Histogram state: one exchange (the bin aggregate), nothing else."""
    p = plan(registry["q_hist_quantile_state"].spark(spark, SF))
    assert p.count(") Exchange") == 1


def test_pq_queries_no_python_nodes(spark, registry):
    """PQ ADC scoring is LUT element_at lookups — pure JVM expressions
    (the kernel twin opts into Arrow explicitly)."""
    p = plan(registry["sim_pq_adc"].spark(spark, SF))
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p


def test_pii_scrub_pure_map_side(spark, registry):
    """PII scrub: zero exchanges, zero joins, zero Python nodes — a
    narrow regex projection that fuses into the scan stage."""
    p = plan(registry["q_pii_redact"].spark(spark, SF))
    assert p.count(") Exchange") == 0
    assert "Join" not in p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p


def test_semdedup_pairs_are_cell_equi_join(spark, registry):
    """SemDeDup's pairwise pass must be an equi-join on the cluster id
    (hash-partitionable), never a cartesian/nested-loop pass."""
    p = plan(registry["q_semdedup_drops"].spark(spark, SF))
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p
    assert "cell" in p


def test_corpus_e2e_no_cartesian_no_python(spark, registry):
    """The composed funnel must keep every stage's bounded-candidate
    shape: no nested-loop/cartesian pass anywhere in the fused plan,
    and nothing falls back to Python evaluation."""
    p = plan(registry["corpus_curation_e2e"].spark(spark, SF))
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p


def test_dsir_scoring_broadcasts_model_no_python(spark, registry):
    """DSIR scoring: the ≤4096-row bucket model joins broadcast (the
    explicit F.broadcast hint), the n-gram explode stays JVM-side, and
    no cartesian pass appears anywhere."""
    p = plan(registry["q_dsir_scores"].spark(spark, SF))
    assert "BroadcastHashJoin" in p
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p


def test_boilerplate_strip_bounded_shape(spark, registry):
    """Boilerplate rewrite: chunking/reassembly stay JVM-side with no
    cartesian pass; the whole rewrite is a bounded-shuffle DAG."""
    p = plan(registry["q_boilerplate_strip"].spark(spark, SF))
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p


def test_dedup_recall_truth_is_equi_join(spark, registry):
    """The exact-truth pair set must come from the inverted-index
    EQUI-join on the shingle hash — never an all-pairs nested loop."""
    p = plan(registry["q_dedup_recall"].spark(spark, SF))
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p


def test_lm_scoring_broadcasts_model_no_python(spark, registry):
    """LM quality scoring: both alphabet-bounded model tables join
    broadcast; the bigram explode stays JVM-side; no cartesian pass."""
    p = plan(registry["q_lm_perplexity_bucket"].spark(spark, SF))
    assert "BroadcastHashJoin" in p
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p


def test_oov_vocab_join_leaves_strategy_to_catalyst(spark, registry):
    """OOV coverage: the token vocabulary grows with the corpus, so the
    operator must NOT carry a broadcast hint — Catalyst picks broadcast
    at toy sf (vocab under the threshold, fine) and flips to shuffle
    when the size estimate grows (same posture as tf-idf). Assert the
    logical plan is hint-free and the physical plan is an equi-join."""
    df = registry["q_oov_rate"].spark(spark, SF)
    assert "UnresolvedHint" not in df._jdf.queryExecution().logical().toString()
    assert "broadcast" not in df._jdf.queryExecution().logical().toString().lower()
    p = plan(df)
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p


def test_pagerank_all_jvm_bounded_joins(spark, registry):
    """Fixed-point PageRank: every iteration is equi-join + hash
    aggregate — no cartesian, no Python, no nested-loop fallback."""
    p = plan(registry["q_pagerank_topk"].spark(spark, SF))
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p


def test_hamming_pairs_equi_join_no_python(spark, registry):
    """Hamming near-dup: candidate generation must be a (band, chunk)
    equi-join — never a cartesian/nested-loop pass — and the signature
    + popcount verify stay JVM-side."""
    p = plan(registry["dedup_simhash_hamming"].spark(spark, SF))
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p


def test_incremental_agg_is_union_plus_one_aggregate(spark, registry):
    """Incremental agg maintenance: state ∪ signed deltas must fold in
    ONE final hash aggregate (map-side partials) with no join in the
    merge itself and nothing in Python."""
    df = registry["q_incremental_agg_maintain"].spark(spark, SF)
    p = plan(df)
    assert "Union" in p
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p


def test_interval_overlap_is_bin_equi_join(spark, registry):
    """Interval x interval overlap: must be the bin equi-join, never
    the BroadcastNestedLoopJoin a raw range-pair predicate lowers to."""
    p = plan(registry["q_interval_overlap_join"].spark(spark, SF))
    assert "BroadcastNestedLoopJoin" not in p
    assert "CartesianProduct" not in p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p


def test_dupspan_no_pairwise_no_python(spark, registry):
    """Duplicated-span dedup: doc-frequency aggregate + semi-join +
    windowed coverage — nothing pairwise, nothing in Python."""
    for name in ("q_dupspan_mass", "q_dupspan_strip"):
        p = plan(registry[name].spark(spark, SF))
        assert "CartesianProduct" not in p
        assert "BroadcastNestedLoopJoin" not in p
        assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
        assert "Window" in p


def test_substring_e2e_composes_clean(spark, registry):
    """Substring-dedup funnel: the full composition stays free of
    cartesian/nested-loop passes and Python."""
    p = plan(registry["corpus_substring_e2e"].spark(spark, SF))
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p


def test_rproj_expression_broadcasts_signs_no_python(spark, registry):
    """Random projection (expression path): the k·d sign matrix
    broadcasts; the contraction is one hash aggregate, no Python."""
    p = plan(registry["q_random_projection"].spark(spark, SF))
    assert "BroadcastHashJoin" in p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p


def test_rproj_kernel_is_single_arrow_stage(spark, registry):
    """Arrow matmul path: exactly one MapInPandas, and the projection
    itself needs NO exchange (the aggregate after it may)."""
    df = registry["q_rproj_kernel"].spark(spark, SF)
    p = plan(df)
    assert p.count("MapInPandas") >= 1
    # the kernel consumes the scan directly — no exchange below it
    assert "SortMergeJoin" not in p


def test_ffd_pack_one_shuffle_one_pandas_group(spark, registry):
    """FFD: ONE exchange (hash by shard) feeding ONE
    FlatMapGroupsInPandas — the per-shard fold is the only Python."""
    p = plan(registry["q_ffd_pack_assign"].spark(spark, SF))
    assert p.count("FlatMapGroupsInPandas") == 2  # formatted prints ×2
    assert "BatchEvalPython" not in p


def test_hilbert_key_stays_jvm_side(spark, registry):
    """The unrolled quadrant fold is pure codegen — no Python nodes,
    no join anywhere in the layout query."""
    p = plan(registry["q_hilbert_layout"].spark(spark, SF))
    assert "EvalPython" not in p and "MapInPandas" not in p
    assert "Join" not in p


def test_incrjoin_delta_terms_no_cartesian(spark, registry):
    p = plan(registry["q_incremental_join_maintain"].spark(spark, SF))
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p


def test_knn_join_is_bucket_equi_join(spark, registry):
    """k-NN self-join: candidates come from a (bucket, d) equi-join —
    never a nested-loop pair enumeration."""
    p = plan(registry["sim_knn_join_bucketed"].spark(spark, SF))
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p
    assert "EvalPython" not in p


def test_entity_resolution_no_cartesian_no_python(spark, registry):
    p = plan(registry["q_entity_resolution_e2e"].spark(spark, SF))
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p
    assert "EvalPython" not in p


def test_json_quarantine_pure_map_side(spark, registry):
    """Dead-letter routing: parse + filter only — zero exchanges."""
    p = plan(registry["q_json_quarantine_rows"].spark(spark, SF))
    assert p.count(") Exchange") == 0
    assert "EvalPython" not in p


def test_nfc_is_single_arrow_stage_plus_join_back(spark, registry):
    """NFC: one MapInPandas for unicodedata; the length/changed join
    back to the injected frame must not be a nested loop."""
    p = plan(registry["q_unicode_nfc"].spark(spark, SF))
    assert p.count("MapInPandas") >= 1
    assert "CartesianProduct" not in p


def test_waterfill_is_dictionary_sized_no_python(spark, registry):
    """Budget water-filling: the k-stats row broadcasts back onto the
    dictionary-sized caps table; no Python nodes anywhere."""
    p = plan(registry["q_budget_waterfill"].spark(spark, SF))
    assert "EvalPython" not in p and "MapInPandas" not in p
    assert "CartesianProduct" not in p


def test_bootstrap_weights_are_map_side(spark, registry):
    """Poisson bootstrap: replicate explode + weight are map-side; the
    only exchange is the per-replicate aggregate."""
    p = plan(registry["q_bootstrap_stats"].spark(spark, SF))
    assert "EvalPython" not in p
    assert "SortMergeJoin" not in p


def test_negative_sampling_exclusion_is_hash_join(spark, registry):
    """The corpus-sized structures stay hash-joined: the positive-set
    anti-join must not degrade to a nested loop. The plan DOES carry
    BroadcastNestedLoopJoins — those are the deliberate k-row
    crossJoins (the 1-row (n, lo) stats and the 8-row slot table
    broadcast onto anchors), which is exactly the scale-safe shape."""
    p = plan(registry["q_negative_samples"].spark(spark, SF))
    assert "CartesianProduct" not in p
    assert "EvalPython" not in p
    # the left_anti against the pair set is a hash join
    assert "BroadcastHashJoin LeftAnti" in p or (
        "LeftAnti" in p and "NestedLoop" not in p.split("LeftAnti")[0][-200:]
    )


def test_join_size_sketch_counters_no_cartesian(spark, registry):
    p = plan(registry["q_join_size_cms"].spark(spark, SF))
    assert "CartesianProduct" not in p
    assert "EvalPython" not in p
