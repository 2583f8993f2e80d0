"""Round-5 regression tests: cache-registry thread-safety (round-4
advice items 1-3) and sql_over_views partial-registration cleanup
(advice item 4)."""

from __future__ import annotations

import threading

import pytest
from pyspark.sql import functions as F

from kafka_avro_order_processor_eg_4131_spark.operators import cache as C
from kafka_avro_order_processor_eg_4131_spark.sources.tables import sql_over_views


class TestFamilyRace:
    def test_concurrent_family_builds_leave_one_persist(self, spark):
        """Two threads racing family() on the same key must converge on
        ONE registered persist and build exactly once — per-key build
        lock (round-4 advice: check-then-act could strand a racing
        duplicate; loser-unpersist is unsafe because Spark's
        CacheManager dedupes plan-identical caches, so it would evict
        the winner's entry)."""
        C.release_all()
        base = C.retained_rdd_ids(spark)

        builds: list = []
        results: list = [None, None]

        def build(slot: int) -> None:
            def builder():
                builds.append(slot)
                return spark.range(1000).withColumn("x", F.col("id") % 7)

            df = C.family(spark, "r5_race_family", "sf-test", builder)
            df.count()
            results[slot] = df

        threads = [threading.Thread(target=build, args=(i,)) for i in range(2)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()

        # Both callers got the SAME winning DataFrame; one builder ran.
        assert results[0] is results[1]
        assert len(builds) == 1
        extra = C.retained_rdd_ids(spark) - base
        assert len(extra) == 1
        C.release_all()
        assert C.retained_rdd_ids(spark) - base == set()

    def test_distinct_families_build_concurrently(self, spark):
        """The per-key locks must not serialize unrelated families: a
        slow eager build of family A cannot block family B."""
        C.release_all()
        started_a = threading.Event()
        finish_a = threading.Event()
        done_b = threading.Event()

        def build_a() -> None:
            def builder():
                started_a.set()
                assert finish_a.wait(timeout=30)
                return spark.range(10)

            C.family(spark, "r5_slow_a", "sf-test", builder)

        def build_b() -> None:
            assert started_a.wait(timeout=30)
            C.family(spark, "r5_fast_b", "sf-test", lambda: spark.range(5))
            done_b.set()

        ta = threading.Thread(target=build_a)
        tb = threading.Thread(target=build_b)
        ta.start()
        tb.start()
        # B completes WHILE A's builder is still inside its build lock.
        assert done_b.wait(timeout=30), "family B was blocked by family A's build"
        finish_a.set()
        ta.join()
        tb.join()
        C.release_all()

    def test_family_eager_failure_releases_persist(self, spark):
        C.release_all()
        base = C.retained_rdd_ids(spark)

        def bad_builder():
            from pyspark.sql import types as T

            @F.udf(T.IntegerType())
            def boom(x):
                raise ValueError("boom")

            return spark.range(10).withColumn("x", boom(F.col("id")))

        with pytest.raises(Exception):
            C.family(spark, "r5_bad_family", "sf-test", bad_builder, eager=True)
        assert "r5_bad_family" not in {k[1] for k in C._FAMILY}
        import time

        for _ in range(50):
            if C.retained_rdd_ids(spark) - base == set():
                break
            time.sleep(0.1)
        assert C.retained_rdd_ids(spark) - base == set()


class TestEphemeralConcurrency:
    def test_parallel_register_and_sweep_no_lost_persists(self, spark):
        """Hammer ephemeral()/release_ephemeral() from several threads;
        after every thread exits, one final sweep must leave zero
        retained RDDs (round-4 advice: unlocked setdefault/pop could
        land an append on a popped list, leaking that persist)."""
        C.release_all()
        base = C.retained_rdd_ids(spark)

        def worker(seed: int) -> None:
            for i in range(5):
                df = C.ephemeral(
                    spark.range(100 + seed * 10 + i).withColumn(
                        "y", F.col("id") + seed
                    )
                )
                df.count()
                C.release_ephemeral(spark)

        threads = [threading.Thread(target=worker, args=(s,)) for s in range(4)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        # Dead-owner rule: anything a worker left behind is reclaimable.
        C.release_ephemeral(spark)
        import time

        for _ in range(50):
            if C.retained_rdd_ids(spark) - base == set():
                break
            time.sleep(0.1)
        assert C.retained_rdd_ids(spark) - base == set()


class TestSqlOverViewsCleanup:
    def test_failed_registration_drops_created_views(self, spark):
        """A failure mid-call must not leak the views registered before
        it (round-4 advice: only spark.sql was inside the try)."""
        before = {t.name for t in spark.catalog.listTables() if t.isTemporary}
        df_ok = spark.range(5)

        class ExplodingDF:
            def createOrReplaceTempView(self, name):
                raise RuntimeError("registration blew up")

        with pytest.raises(RuntimeError, match="registration blew up"):
            sql_over_views(
                spark,
                "SELECT * FROM {a} JOIN {b} USING (id)",
                a=df_ok,
                b=ExplodingDF(),
            )
        after = {t.name for t in spark.catalog.listTables() if t.isTemporary}
        assert after == before

    def test_happy_path_still_drops_views(self, spark):
        before = {t.name for t in spark.catalog.listTables() if t.isTemporary}
        out = sql_over_views(
            spark,
            "SELECT count(*) AS n FROM {a}",
            a=spark.range(7),
        )
        assert out.collect()[0]["n"] == 7
        assert {t.name for t in spark.catalog.listTables() if t.isTemporary} == before
