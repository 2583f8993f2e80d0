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


def test_minhash_join_is_on_buckets_not_all_pairs(spark, sf_small):
    plan = _plan(spark, "dedup_minhash_candidates", sf_small)
    # candidate generation must be an equi-join (hash join on band/bucket),
    # never a cartesian/nested-loop product
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan, (
        plan[:2000]
    )
