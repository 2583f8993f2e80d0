"""Physical-plan regression tests: the plan properties documented in
docs/PLANS.md are asserted so a refactor can't silently regress them
(pruned scans, pushed filters, broadcast joins, TakeOrdered top-k,
map-side partial aggregation)."""

from __future__ import annotations

from kafka_avro_order_processor_eg_4131_spark.catalog import REGISTRY


def _plan(spark, name, sf_dir) -> str:
    df = REGISTRY[name].fn(spark, sf_dir)
    return df._jdf.queryExecution().executedPlan().toString()


def test_flagship_scan_is_column_pruned(spark, sf_small):
    plan = _plan(spark, "route_status_agg", sf_small)
    assert "ReadSchema: struct<o_totalprice:double>" in plan, plan[:1500]
    # partial + final aggregation (map-side combine before the exchange)
    assert "partial_count" in plan or "HashAggregate" in plan


def test_q3_filters_pushed_and_broadcast(spark, sf_small):
    plan = _plan(spark, "q3_shipping_priority", sf_small)
    assert "PushedFilters" in plan and "BUILDING" in plan, plan[:2000]
    assert "BroadcastHashJoin" in plan
    assert "TakeOrderedAndProject" in plan


def test_topk_never_global_sorts(spark, sf_small):
    plan = _plan(spark, "topk_orders_by_price", sf_small)
    assert "TakeOrderedAndProject" in plan
    assert "Sort " not in plan  # no standalone global sort operator


def test_transient_filter_pushed_to_scan(spark, sf_small):
    plan = _plan(spark, "route_transient_filter", sf_small)
    # fmod(col, 1500) isn't a pushable predicate, but the scan must still
    # prune to the two referenced columns
    assert "ReadSchema: struct<o_orderkey:bigint,o_totalprice:double>" in plan, plan[:1500]


def test_semi_join_is_semi(spark, sf_small):
    plan = _plan(spark, "join_semi_urgent_customers", sf_small)
    assert "LeftSemi" in plan, plan[:1500]


def test_funnel_interval_join_is_hash_not_cartesian(spark, sf_small):
    plan = _plan(spark, "funnel_click_to_purchase", sf_small)
    assert "CartesianProduct" not in plan, plan[:2000]
    # equi-key with range residual -> hash join (broadcast or shuffled)
    assert "HashJoin" in plan or "SortMergeJoin" in plan, plan[:2000]


def test_q1_scan_pruned_to_agg_columns(spark, sf_small):
    plan = _plan(spark, "q1_pricing_summary", sf_small)
    # shipdate predicate pushed; only the 7 referenced columns read
    assert "PushedFilters" in plan, plan[:1500]
    assert "l_orderkey" not in plan.split("ReadSchema")[-1][:400]


def test_q10_topk_is_take_ordered(spark, sf_small):
    plan = _plan(spark, "q10_returned_items", sf_small)
    assert "TakeOrderedAndProject" in plan, plan[:2000]
    assert "BroadcastHashJoin" in plan  # nation stays broadcast


def test_q15_scalar_max_is_broadcast_not_collect(spark, sf_small):
    plan = _plan(spark, "q15_top_supplier", sf_small)
    # the 1-row max() aggregate joins back via broadcast — the whole query
    # is one plan, no driver-side collect boundary
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan, plan[:2500]


def test_q17_decorrelated_no_cartesian(spark, sf_small):
    plan = _plan(spark, "q17_small_quantity_revenue", sf_small)
    assert "CartesianProduct" not in plan, plan[:2500]


def test_q21_semi_anti_shape_no_cartesian(spark, sf_small):
    plan = _plan(spark, "q21_waiting_suppliers", sf_small)
    assert "CartesianProduct" not in plan, plan[:2500]
    assert "BroadcastHashJoin" in plan  # supplier dim broadcast


def test_q22_anti_join_is_anti(spark, sf_small):
    plan = _plan(spark, "q22_global_sales_opportunity", sf_small)
    assert "LeftAnti" in plan, plan[:2500]


def test_fact_fact_join_flips_to_sort_merge_at_scale(spark, sf_small):
    """At fixture scale every join broadcasts; on a 100 TB cluster the
    fact-fact joins exceed any broadcast threshold and must degrade to
    shuffled SortMergeJoin — simulate by disabling the threshold and
    assert the plan flips (and still contains no cartesian)."""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        plan = _plan(spark, "q12_priority_shipping", sf_small)
        assert "SortMergeJoin" in plan, plan[:2500]
        assert "CartesianProduct" not in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_minhash_join_is_on_buckets_not_all_pairs(spark, sf_small):
    plan = _plan(spark, "dedup_minhash_candidates", sf_small)
    # candidate generation must be an equi-join (hash join on band/bucket),
    # never a cartesian/nested-loop product
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan, (
        plan[:2000]
    )


def test_hash_sample_filter_is_pushed_scan_not_shuffle(spark, sf_small):
    """Deterministic sampling must be a plain filter over the scan —
    no shuffle, no sort, no sample operator with partition coupling."""
    plan = _plan(spark, "sample_hash_bernoulli", sf_small)
    assert "Exchange" not in plan, plan[:2000]
    assert "Sample" not in plan


def test_fixed_k_sample_is_take_ordered(spark, sf_small):
    """k-of-n hash-rank sampling must run as TakeOrderedAndProject
    (per-task heaps merged at the driver), never a global sort."""
    plan = _plan(spark, "sample_fixed_k_hash_rank", sf_small)
    assert "TakeOrderedAndProject" in plan, plan[:2000]
    assert "Sort " not in plan


def test_decontam_benchmark_side_is_broadcast(spark, sf_small):
    """The benchmark trigram set is tiny; the contamination probe must
    broadcast it so the corpus side never shuffles for the join."""
    plan = _plan(spark, "decontam_trigram_overlap", sf_small)
    assert "BroadcastHashJoin" in plan, plan[:2500]
    assert "CartesianProduct" not in plan


def test_edit_distance_blocking_is_equi_join(spark, sf_small):
    """Blocked edit-distance dedup must hash-join on the (brand, size)
    block key with levenshtein as a post-join filter — never the
    quadratic cross product."""
    plan = _plan(spark, "dedup_edit_distance_pairs", sf_small)
    assert "CartesianProduct" not in plan, plan[:2500]
    assert "BroadcastNestedLoopJoin" not in plan
    assert "HashJoin" in plan or "SortMergeJoin" in plan


def test_pack_sequences_window_is_partitioned(spark, sf_small):
    """The packing cumsum must window per source, never collapse to a
    single partition (the WindowExec all-to-one warning path)."""
    df = REGISTRY["pack_sequences_by_budget"].fn(spark, sf_small)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Window" in plan, plan[:2000]
    assert "hashpartitioning(source" in plan, plan[:2500]


def test_lateral_topk_is_decorrelated_window_limit(spark, sf_small):
    # the LATERAL ... ORDER BY ... LIMIT 2 subquery must decorrelate to a
    # per-key WindowGroupLimit + hash join, never a per-row nested loop
    plan = _plan(spark, "lateral_top2_lineitems", sf_small)
    assert "WindowGroupLimit" in plan, plan[:2000]
    assert "NestedLoop" not in plan, plan[:2000]
    # the orders-side filter reaches the scan
    assert "GreaterThan(o_totalprice" in plan, plan[:2000]


def test_range_join_is_bucketed_equi_not_cartesian(spark, sf_small):
    # the interval self-join must meet on (user_id, bucket) as an
    # equi-join; the time predicate is a residual filter, not a
    # cartesian/broadcast-nested-loop condition
    plan = _plan(spark, "range_join_user_event_pairs", sf_small)
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan, plan[:2000]
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan or "BroadcastHashJoin" in plan


def test_corpus_mix_has_no_shuffle(spark, sf_small):
    # the mixture materializes map-side: scan -> project -> explode; a
    # shuffle here would mean the weights were implemented as a join
    plan = _plan(spark, "corpus_mix_epoch_weights", sf_small)
    assert "Exchange" not in plan, plan[:2000]
    assert "Generate explode" in plan, plan[:2000]


def test_zscore_stats_side_is_broadcast(spark, sf_small):
    # the per-type stats table is tiny — it must come back as a broadcast
    # probe, so the operator costs one shuffle (the stats agg), not two
    plan = _plan(spark, "events_anomaly_zscore", sf_small)
    assert "BroadcastHashJoin" in plan, plan[:2000]


def test_session_paths_windows_are_partitioned(spark, sf_small):
    # both sessionization windows partition by user_id; a global (empty
    # partition-by) window would funnel the corpus into one task
    plan = _plan(spark, "session_event_paths", sf_small)
    assert "windowspecdefinition(user_id" in plan, plan[:3000]
    assert "TakeOrderedAndProject" in plan  # top-20 paths, no global sort


def test_quality_deciles_ntile_is_partitioned(spark, sf_small):
    plan = _plan(spark, "doc_quality_deciles", sf_small)
    assert "windowspecdefinition(lang" in plan, plan[:3000]


def test_copurchase_pair_join_is_equi_not_cartesian(spark, sf_small):
    plan = _plan(spark, "copurchase_part_pairs_lift", sf_small)
    assert "CartesianProduct" not in plan, plan[:2000]
    # pairs form via an equi-join on the order key with the < residual
    assert "SortMergeJoin" in plan or "HashJoin" in plan, plan[:2000]
    assert "TakeOrderedAndProject" in plan  # top-20 never global-sorts


def test_profile_is_single_scan(spark, sf_small):
    plan = _plan(spark, "profile_orders_columns", sf_small)
    # one parquet scan feeds every column's metrics (Expand for the
    # multi-DISTINCT), not one scan per column
    assert plan.count("Scan parquet") == 1, plan[:2000]
    assert "Expand" in plan


def test_interarrival_windows_are_partitioned(spark, sf_small):
    plan = _plan(spark, "events_interarrival_stats", sf_small)
    # the lag window must be keyed by user_id, never a global window
    assert "user_id" in plan.split("Window")[1][:300], plan[:2000]


def test_winsorized_thresholds_are_broadcast(spark, sf_small):
    plan = _plan(spark, "agg_winsorized_mean", sf_small)
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan, plan[:2000]


def test_postings_is_one_aggregate_no_join(spark, sf_small):
    plan = _plan(spark, "doc_postings_lists", sf_small)
    assert "Join" not in plan, plan[:2000]
    assert "HashAggregate" in plan or "ObjectHashAggregate" in plan


def test_grouped_median_range_partitions_no_tiny_window(spark, sf_small):
    plan = _plan(spark, "median_price_by_segment", sf_small)
    # the composite-key two-pass rank must range-partition; a naive
    # PARTITION BY c_mktsegment window (5 near-global partitions) would
    # show a hash partitioning on the segment alone feeding the window
    assert "rangepartitioning(c_mktsegment" in plan.lower(), plan[:2000]
    # the per-segment offset relation joins back via broadcast
    assert "BroadcastHashJoin" in plan, plan[:2000]


def test_ewma_window_partitions_by_user(spark, sf_small):
    plan = _plan(spark, "events_ewma_value", sf_small)
    assert "windowspecdefinition(user_id" in plan.lower(), plan[:2000]
    assert "CartesianProduct" not in plan


def test_transition_matrix_no_global_window(spark, sf_small):
    plan = _plan(spark, "event_transition_matrix", sf_small)
    low = plan.lower()
    # both windows carry partition specs (user_id lag; prev_type norm)
    assert "windowspecdefinition(user_id" in low, plan[:2000]
    assert "windowspecdefinition(prev_type" in low, plan[:2000]


def test_skyline_no_cartesian_and_broadcast_offsets(spark, sf_small):
    plan = _plan(spark, "skyline_price_size_parts", sf_small)
    assert "CartesianProduct" not in plan, plan[:2000]
    # the triangular offsets fold and the offsets fold-back both broadcast
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def test_oov_vocab_join_is_broadcast(spark, sf_small):
    plan = _plan(spark, "doc_oov_rate", sf_small)
    assert "BroadcastHashJoin" in plan, plan[:2000]


def test_pct_rank_uses_range_partition_not_source_window(spark, sf_small):
    plan = _plan(spark, "doc_quality_pct_rank_by_source", sf_small)
    low = plan.lower()
    assert "rangepartitioning(source" in low, plan[:2000]
    # no window partitioned by source alone (the near-global trap)
    assert "windowspecdefinition(source#" not in low


def test_max_concurrency_sweep_uses_range_partition(spark, sf_small):
    plan = _plan(spark, "session_max_concurrency", sf_small)
    low = plan.lower()
    # the endpoint cumsum range-partitions on the sweep key (t, ...)
    assert "rangepartitioning(t#" in low, plan[:2000]
    assert "CartesianProduct" not in plan


def test_attribution_asof_is_one_keyed_window_no_pair_blowup(spark, sf_small):
    plan = _plan(spark, "attribution_last_touch", sf_small)
    low = plan.lower()
    # union-sort as-of: window keyed on the join key, no nested-loop join
    assert "windowspecdefinition(__k" in low, plan[:2000]
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_hard_negatives_broadcasts_query_side(spark, sf_small):
    plan = _plan(spark, "ann_hard_negatives", sf_small)
    # tiny query set broadcast over the spread corpus
    assert "BroadcastNestedLoopJoin" in plan, plan[:2000]


def test_scd2_windows_all_keyed_by_user(spark, sf_small):
    plan = _plan(spark, "scd2_user_type_history", sf_small)
    low = plan.lower()
    assert "windowspecdefinition(user_id" in low, plan[:2000]


def test_dedup_rate_broadcasts_cluster_sizes(spark, sf_small):
    plan = _plan(spark, "corpus_dedup_rate_by_source", sf_small)
    assert "BroadcastHashJoin" in plan, plan[:2000]
    assert "CartesianProduct" not in plan


def test_funnel_ordered_has_no_joins(spark, sf_small):
    plan = _plan(spark, "funnel_ordered_steps_1h", sf_small)
    low = plan.lower()
    for bad in ("sortmergejoin", "broadcasthashjoin", "shuffledhashjoin",
                "broadcastnestedloopjoin", "cartesianproduct"):
        assert bad not in low, plan[:2000]
    assert "windowspecdefinition(user_id" in low


def test_son_recount_join_is_broadcast(spark, sf_small):
    plan = _plan(spark, "frequent_terms_son", sf_small)
    assert "BroadcastHashJoin" in plan, plan[:2000]
    assert "CartesianProduct" not in plan


def test_ks_mannwhitney_no_cartesian_one_row_broadcasts(spark, sf_small):
    plan = _plan(spark, "stats_ks_mannwhitney_segments", sf_small)
    assert "CartesianProduct" not in plan, plan[:2000]
    # the 1-row totals/max relations come back as broadcasts
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


def test_cohort_ltv_sized_join_is_broadcast(spark, sf_small):
    plan = _plan(spark, "cohort_ltv_monthly", sf_small)
    assert "BroadcastHashJoin" in plan, plan[:2000]
    assert "CartesianProduct" not in plan


def test_markov_eval_pred_table_is_broadcast(spark, sf_small):
    plan = _plan(spark, "eval_markov_next_event_accuracy", sf_small)
    assert "BroadcastHashJoin" in plan, plan[:2000]


def test_embedding_neardup_is_banded_equi_join(spark, sf_small):
    """The registered embedding near-dup plan must generate candidates
    via the (table, bucket) sign-LSH equi-join — never the O(n^2)
    cross product the round-2 catalog shipped (round-2 verdict #1).
    The only nested-loop joins allowed are broadcast crosses against
    tiny single-row/plane relations, which carry no pair semantics.
    Families released first: the pairs relation is family-cached, and a
    warm cache would present an InMemoryTableScan instead of the join
    shape under test."""
    from kafka_avro_order_processor_eg_4131_spark.operators import cache as C

    C.release_families(spark)
    plan = _plan(spark, "dedup_embedding_cosine_pairs", sf_small)
    assert "CartesianProduct" not in plan, plan[:2500]
    # keyed equi-join on the bucket key — BroadcastHashJoin when planned
    # from raw stats, SortMergeJoin when the sides are cached scans
    join_lines = [
        ln
        for ln in plan.splitlines()
        if ("HashJoin" in ln or "SortMergeJoin" in ln) and "table_id" in ln
    ]
    assert join_lines, plan[:2500]
    # the pair predicate (id1 < id2) rides the bucket equi-join as a
    # residual condition, not a nested-loop join condition
    assert any("id1" in ln for ln in join_lines), join_lines
