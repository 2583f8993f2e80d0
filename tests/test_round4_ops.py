"""Round-4 hygiene: the ephemeral registry is (session, thread)-keyed
so one thread's sweep can never strip another thread's unmaterialized
load-bearing persist (round-3 ADVICE, medium), and a failed eager
family materialization cannot strand an owner-less persist (round-3
ADVICE, low).
"""

from __future__ import annotations

import threading

import pytest
from pyspark.sql import functions as F

from kafka_avro_order_processor_eg_4131_spark.operators import cache as C


class TestEphemeralThreadKeying:
    def test_other_threads_entries_survive_my_sweep(self, spark):
        """An ephemeral persist registered by a LIVE thread B must NOT
        be released by thread A's release_ephemeral() — B's consuming
        action may not have run yet. Once B exits, its bucket becomes
        reclaimable by any sweep (round-4 advice: otherwise dead
        threads' persists leak until the terminal release_all)."""
        C.release_all()
        base = C.retained_rdd_ids(spark)

        registered_evt = threading.Event()
        proceed_evt = threading.Event()

        def register_from_worker():
            df = spark.range(100).withColumn("x", F.col("id") * 2)
            df = C.ephemeral(df)
            df.count()
            registered_evt.set()
            proceed_evt.wait(timeout=30)

        t = threading.Thread(target=register_from_worker)
        t.start()
        assert registered_evt.wait(timeout=30)

        added = C.retained_rdd_ids(spark) - base
        assert added, "worker thread's persist should be retained"

        # Main thread's sweep while the worker is ALIVE: leaves it alone.
        C.release_ephemeral()
        assert (C.retained_rdd_ids(spark) - base) == added

        # After the worker exits, the same sweep reclaims its bucket.
        proceed_evt.set()
        t.join()
        assert C.release_ephemeral() == 1
        assert (C.retained_rdd_ids(spark) - base) == set()

        C.release_all()
        assert (C.retained_rdd_ids(spark) - base) == set()

    def test_my_sweep_releases_my_entries(self, spark):
        C.release_all()
        base = C.retained_rdd_ids(spark)
        df = C.ephemeral(spark.range(50).withColumn("y", F.col("id") + 1))
        df.count()
        assert C.retained_rdd_ids(spark) - base
        assert C.release_ephemeral() == 1
        assert (C.retained_rdd_ids(spark) - base) == set()

    def test_session_scoped_sweep(self, spark):
        """release_ephemeral(spark) releases only that session's entries
        from this thread (single-session here: behaves like the
        default)."""
        C.release_all()
        base = C.retained_rdd_ids(spark)
        df = C.ephemeral(spark.range(10))
        df.count()
        assert C.release_ephemeral(spark) == 1
        assert (C.retained_rdd_ids(spark) - base) == set()


class TestRetrieverFamilyCache:
    def test_topk_relations_built_once(self, spark, sf_small):
        """The ANN retriever results are family-cached: repeated calls
        (ann_eval_fusion_gain used to derive lsh_topk twice in one plan,
        double-persisting the identical ephemeral bucketed relation —
        the round-3 `Asked to cache already cached data` warning) now
        return the SAME cached DataFrame, so each builder — and its
        internal ephemeral persist — runs exactly once per session."""
        from kafka_avro_order_processor_eg_4131_spark.plans import similarity as P

        C.release_all()
        first = P.ann_lsh_topk(spark, sf_small)
        assert P.ann_lsh_topk(spark, sf_small) is first
        assert P.ann_ivf_topk(spark, sf_small) is P.ann_ivf_topk(spark, sf_small)
        assert P.ann_cosine_topk(spark, sf_small) is P.ann_cosine_topk(
            spark, sf_small
        )
        # The fusion ablation composes the cached relations: after one
        # materialization, no NEW ephemeral entries appear on a rebuild.
        P.ann_eval_fusion_gain(spark, sf_small).count()
        C.release_ephemeral()
        before = C.retained_rdd_ids(spark)
        P.ann_eval_fusion_gain(spark, sf_small).count()
        assert C.release_ephemeral() == 0
        assert C.retained_rdd_ids(spark) == before
        C.release_all()


class TestFamilyEagerFailure:
    def test_failed_eager_count_unpersists(self, spark):
        """If the eager count() raises, the half-built persist must be
        unpersisted and NOT registered — no owner-less cache entry."""
        C.release_all()
        base = C.retained_rdd_ids(spark)

        @F.udf("int")
        def boom(x):
            raise ValueError("forced materialization failure")

        def build():
            return spark.range(10).withColumn("b", boom(F.col("id")))

        with pytest.raises(Exception):
            C.family(spark, "r4.test_boom", "/none", build, eager=True)

        assert (C.retained_rdd_ids(spark) - base) == set()
        # Not registered: a subsequent good builder runs fresh.
        good = C.family(spark, "r4.test_boom", "/none", lambda: spark.range(3))
        assert good.count() == 3
        C.release_all()
