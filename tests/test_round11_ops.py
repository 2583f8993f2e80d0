"""Round-11 pins: session-cache structure added this round.

- Table-plan memo: catalog.load returns the SAME DataFrame object per
  (session, sf_dir, table) — repeated spark.read.parquet resolution
  was pure driver overhead across the 223-query catalog.
- Eager topk caches: a lazy persist is NOT populated when its first
  consumer broadcasts it (BroadcastExchange collects the child without
  filling the RDD cache), so the tiny ANN topk families must
  eager-materialize at build time or every consumer silently re-runs
  the builder. These tests pin the mechanism, not just the config: the
  cache must be FULLY materialized immediately after the cached getter
  returns.
- _components_expanded is family-cached (one row per member — linear,
  unlike the pair expansions that must stay lazy).
"""

from __future__ import annotations

from kafka_avro_order_processor_eg_4131_spark.catalog import load
from kafka_avro_order_processor_eg_4131_spark.operators import cache as C


def _fully_cached_names(spark) -> dict[str, tuple[int, int]]:
    """RDD name -> (cached partitions, total partitions) for every
    entry the JVM block manager currently tracks."""
    infos = spark.sparkContext._jsc.sc().getRDDStorageInfo()
    return {
        i.name(): (i.numCachedPartitions(), i.numPartitions()) for i in infos
    }


class TestTablePlanMemo:
    def test_load_returns_memoized_object(self, spark, sf_small):
        a = load(spark, sf_small, "orders")
        b = load(spark, sf_small, "orders")
        assert a is b, "table plan should be session-memoized"
        # distinct tables / dirs get distinct entries
        c = load(spark, sf_small, "lineitem")
        assert c is not a

    def test_memo_cleared_with_families(self, spark, sf_small):
        a = load(spark, sf_small, "orders")
        C.release_families(spark)
        b = load(spark, sf_small, "orders")
        assert a is not b, "release_families must clear the table memo"

    def test_memoized_plan_still_pushes_filters(self, spark, sf_small):
        """The memo shares the LAZY plan only — a filtered consumer must
        still reach the parquet scan with a pushed filter."""
        load(spark, sf_small, "orders")  # prime the memo
        df = load(spark, sf_small, "orders").filter("o_orderkey = 1").select(
            "o_orderkey"
        )
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "PushedFilters: [" in plan and "o_orderkey" in plan


class TestEagerTopkCaches:
    def test_lsh_topk_cache_fully_materialized_at_build(self, spark, sf_small):
        """The eager fence: immediately after the cached getter returns,
        every partition must already be cached — a lazy persist here
        would be silently rebuilt by each broadcasting consumer
        (measured round 11: 1.8-2.8 s per 'cache read', 0.25 s real)."""
        from kafka_avro_order_processor_eg_4131_spark.plans.similarity import (
            _lsh_topk_cached,
            _rrf_fusion_cached,
        )

        C.release_families(spark)
        try:
            lsh = _lsh_topk_cached(spark, sf_small)
            cached = _fully_cached_names(spark)
            plan_key = lsh._jdf.queryExecution().analyzed().toString()[:60]
            fully = [n for n, (c_, t) in cached.items() if t > 0 and c_ == t]
            assert fully, (
                "no fully-cached RDD right after _lsh_topk_cached — the "
                f"eager materialization regressed (storage: {cached}, "
                f"plan: {plan_key})"
            )
            # the fused rrf relation eagerly materializes too
            _rrf_fusion_cached(spark, sf_small)
            n_before = len(
                [n for n, (c_, t) in _fully_cached_names(spark).items()
                 if t > 0 and c_ == t]
            )
            assert n_before >= 2
        finally:
            C.release_families(spark)
            C.release_ephemeral(spark)


class TestComponentsExpandedCached:
    def test_components_expanded_is_family_cached(self, spark, sf_small):
        from kafka_avro_order_processor_eg_4131_spark.plans.dedup import (
            _components_expanded,
        )

        C.release_families(spark)
        try:
            a = _components_expanded(spark, sf_small)
            b = _components_expanded(spark, sf_small)
            assert a is b, "components expansion should build once per session"
        finally:
            C.release_families(spark)
            C.release_ephemeral(spark)
