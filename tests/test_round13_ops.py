"""Round-13 pins (optimization round 2).

- Consumer-level PLAN memoization for the lazily-expanded dedup pair
  relations (plans/dedup.py::_plan_memo, round-12 verdict item 1):
  the expanded relations are pure plan (never persisted — the round-7
  quadratic-blowup rule), but rebuilding one costs 0.3-1.5 s of py4j +
  eager analysis per consumer touch. The memo returns the SAME
  DataFrame object per (session, sf_dir) and is invalidated together
  with the family caches (release_families), so a released family can
  never leak through a stale consumer plan.
"""

from __future__ import annotations

from kafka_avro_order_processor_eg_4131_spark.operators import cache as C


class TestDedupPlanMemo:
    def test_expanded_helpers_return_same_object(self, spark, sf_small):
        """Two touches of every memoized expansion helper return the
        IDENTICAL DataFrame object (plan reuse, not a rebuild)."""
        from kafka_avro_order_processor_eg_4131_spark.plans import dedup as P

        helpers = [
            P._sigs_cached,
            P._candidates_expanded,
            P._jaccard_expanded,
            P._simhash_expanded,
            P._simhash_pairs_expanded,
            P._embedding_pairs_cached,
        ]
        try:
            for h in helpers:
                assert h(spark, sf_small) is h(spark, sf_small), h.__name__
        finally:
            C.release_all()

    def test_release_families_invalidates_plan_memo(self, spark, sf_small):
        """release_families() drops the memoized plans with the family
        caches: the next touch rebuilds a FRESH DataFrame whose plan no
        longer references the released (unpersisted) family entries."""
        from kafka_avro_order_processor_eg_4131_spark.plans import dedup as P

        try:
            before = P._jaccard_expanded(spark, sf_small)
            C.release_families(spark)
            after = P._jaccard_expanded(spark, sf_small)
            assert before is not after
            # and the rebuilt plan still computes the same rows
            assert sorted(map(tuple, after.collect())) == sorted(
                map(tuple, before.collect())
            )
        finally:
            C.release_all()

    def test_memoized_plan_results_stable(self, spark, sf_small):
        """A memoized plan's results equal a fresh rebuild's results —
        the memo changes construction cost, never what is computed."""
        from kafka_avro_order_processor_eg_4131_spark.plans import dedup as P

        try:
            memoized = P._simhash_pairs_expanded(spark, sf_small).collect()
            C.release_families(spark)
            fresh = P._simhash_pairs_expanded(spark, sf_small).collect()
            assert sorted(map(tuple, memoized)) == sorted(map(tuple, fresh))
        finally:
            C.release_all()
