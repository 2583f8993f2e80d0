"""Round-6 regression tests: memo() per-key build lock (round-5 verdict
item 5), release_families leaving in-flight build locks alone (round-5
advice item 2), the semdedup cell-bounded fallback staying bit-identical
to the registered LSH-served plan (advice item 4), the driver-check
--sample 0 guard (advice item 3), and the scale-rehearsal harness
counting errored queries as bad curvature (advice item 1)."""

from __future__ import annotations

import importlib.util
import os
import threading
import time

import pytest

from kafka_avro_order_processor_eg_4131_spark.operators import cache as C

TESTS_DIR = os.path.dirname(os.path.abspath(__file__))


def _load_by_path(name: str):
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(TESTS_DIR, f"{name}.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


class TestMemoRace:
    def test_memo_builds_once_under_race(self, spark):
        """Two threads racing memo() on the same key must run the
        builder exactly ONCE and converge on the same object. Before
        round 6 the loser's build ran to completion and was dropped —
        harmless for correctness but minutes of duplicate cluster time
        for a BPE training build (round-5 verdict item 2); now the same
        per-key lock discipline as family() applies."""
        C.release_all()
        builds: list[int] = []
        results: list[object] = [None, None]
        gate = threading.Barrier(2)

        def run(slot: int) -> None:
            def builder():
                builds.append(slot)
                time.sleep(0.2)  # wide race window: loser must WAIT, not build
                return {"vocab": slot}

            gate.wait()
            results[slot] = C.memo(spark, "r6_race_memo", "sf-test", builder)

        threads = [threading.Thread(target=run, args=(i,)) for i in range(2)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()

        assert len(builds) == 1
        assert results[0] is results[1]
        C.release_all()

    def test_memo_distinct_keys_build_concurrently(self, spark):
        """The per-key memo locks must not serialize unrelated keys: a
        slow build of key A cannot block key B (same guarantee the
        family() locks already have)."""
        C.release_all()
        a_started = threading.Event()
        a_release = threading.Event()
        b_done = threading.Event()

        def build_a():
            def builder():
                a_started.set()
                assert a_release.wait(timeout=10)
                return "A"

            C.memo(spark, "r6_memo_slow_a", "sf-test", builder)

        def build_b():
            assert a_started.wait(timeout=10)
            C.memo(spark, "r6_memo_fast_b", "sf-test", lambda: "B")
            b_done.set()

        ta = threading.Thread(target=build_a)
        tb = threading.Thread(target=build_b)
        ta.start()
        tb.start()
        # B must finish while A's builder is still parked on its event.
        assert b_done.wait(timeout=10), "memo key B blocked behind unrelated key A"
        a_release.set()
        ta.join()
        tb.join()
        C.release_all()


class TestReleaseKeepsHeldBuildLocks:
    @pytest.mark.parametrize("registry_name", ["_FAMILY_BUILDING", "_MEMO_BUILDING"])
    def test_release_families_spares_in_flight_locks(self, spark, registry_name):
        """release_families() must only drop build-lock entries nobody
        holds: dropping a HELD lock lets a caller arriving post-release
        mint a fresh lock and run a duplicate concurrent build whose
        late finisher overwrites the registry entry without unpersisting
        the earlier handle (round-5 advice item 2)."""
        registry = getattr(C, registry_name)
        key_held = (id(spark.sparkContext), "r6_inflight", "sf-test")
        key_idle = (id(spark.sparkContext), "r6_idle", "sf-test")
        held = registry.setdefault(key_held, threading.Lock())
        registry.setdefault(key_idle, threading.Lock())
        assert held.acquire(blocking=False)
        try:
            C.release_families(spark)
            assert key_held in registry, "in-flight build lock was dropped"
            assert registry[key_held] is held, "in-flight build lock was replaced"
            assert key_idle not in registry, "idle build lock should be swept"
        finally:
            held.release()
            registry.pop(key_held, None)

    def test_family_caller_after_release_reuses_in_flight_lock(self, spark):
        """End-to-end shape of the advice scenario: release_families()
        fires while a family build is in flight; a caller arriving
        AFTER the release must wait on the surviving lock and reuse the
        winner's relation instead of building a duplicate."""
        C.release_all()
        builds: list[int] = []
        started = threading.Event()
        release = threading.Event()
        results: list[object] = [None, None]

        def slow_build():
            def builder():
                builds.append(0)
                started.set()
                assert release.wait(timeout=10)
                return spark.range(10)

            results[0] = C.family(spark, "r6_release_race", "sf-test", builder)

        t = threading.Thread(target=slow_build)
        t.start()
        assert started.wait(timeout=10)
        C.release_families(spark)  # fires mid-build: must NOT drop the held lock
        late = threading.Thread(
            target=lambda: results.__setitem__(
                1,
                C.family(
                    spark,
                    "r6_release_race",
                    "sf-test",
                    lambda: (builds.append(1), spark.range(10))[1],
                ),
            )
        )
        late.start()
        release.set()
        t.join()
        late.join()
        assert builds == [0], f"duplicate build ran: {builds}"
        assert results[1] is results[0]
        C.release_all()


class TestSemdedupFallback:
    def test_semdedup_cell_bounded_fallback_matches(self, spark, sf_small):
        """The standalone cell-bounded exhaustive-join fallback must
        stay bit-identical to the registered LSH-family-served plan on
        the fixture — it is the documented escape hatch when LSH band
        constants are retuned and recall is no longer pinned (round-5
        advice item 4)."""
        from kafka_avro_order_processor_eg_4131_spark.catalog import REGISTRY
        from kafka_avro_order_processor_eg_4131_spark.plans.dedup import (
            semdedup_keep_list_cell_bounded,
        )

        registered = sorted(
            (r.doc_id, r.cell_id, r.kept)
            for r in REGISTRY["semdedup_keep_list"].fn(spark, sf_small).collect()
        )
        fallback = sorted(
            (r.doc_id, r.cell_id, r.kept)
            for r in semdedup_keep_list_cell_bounded(spark, sf_small).collect()
        )
        C.release_ephemeral(spark)
        assert len(registered) > 0
        assert fallback == registered

    def test_semdedup_cell_bounded_plan_is_cell_equi_join(self, spark, sf_small):
        """The fallback is unregistered, so the catalog-wide
        no-CartesianProduct guard never sees it — pin its plan shape
        here: the within-cell pairing must be a hash/sort-merge equi-join
        on cell_id (cell-size-bounded), never a cartesian/nested-loop
        that would go corpus-quadratic."""
        from kafka_avro_order_processor_eg_4131_spark.plans.dedup import (
            semdedup_keep_list_cell_bounded,
        )

        plan = (
            semdedup_keep_list_cell_bounded(spark, sf_small)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        C.release_ephemeral(spark)
        # The centroid attach IS a BroadcastNestedLoopJoin — that's the
        # package's accepted tiny-broadcast pattern (the build side is
        # the _SEMDEDUP_CELLS-row centroid relation), same as in the
        # registered plan. Only a CartesianProduct (two NON-broadcast
        # sides) would be the quadratic scale-killer.
        assert "CartesianProduct" not in plan, plan[:2000]
        assert "HashJoin" in plan or "SortMergeJoin" in plan, plan[:2000]


class TestDriverCheckSampleGuard:
    def test_sample_zero_rejected(self):
        mod = _load_by_path("run_driver_check")
        with pytest.raises(SystemExit, match="positive"):
            mod.select_names(["a", "b", "c"], None, 0, seed=1)
        with pytest.raises(SystemExit, match="positive"):
            mod.select_names(["a", "b", "c"], None, -2, seed=1)

    def test_sample_none_is_full_catalog(self):
        mod = _load_by_path("run_driver_check")
        assert mod.select_names(["b", "a", "c"], None, None, seed=1) == ["a", "b", "c"]

    def test_sample_draw_is_seed_deterministic(self):
        mod = _load_by_path("run_driver_check")
        names = [f"q{i}" for i in range(40)]
        d1 = mod.select_names(names, None, 5, seed=6)
        d2 = mod.select_names(names, None, 5, seed=6)
        d3 = mod.select_names(names, None, 5, seed=7)
        assert d1 == d2
        assert len(d1) == 5
        assert d1 != d3  # overwhelmingly likely; pins the seed is honored


class TestScaleRehearsalErrorCounting:
    def test_errored_query_counts_as_bad(self, capsys):
        """A query that throws records (dt, rows) = (-1, -1); its ratio
        is negative/NaN and would previously sail under the 2.0
        curvature threshold, letting a quadratic that OOMs at 3x read
        as flat (round-5 advice item 1). Any error cell must count as
        bad."""
        mod = _load_by_path("scale_rehearsal")
        dirs = ["sf1", "sf2", "sf3"]
        ok = {"sf1": (1.0, 10), "sf2": (1.1, 20), "sf3": (1.2, 30)}
        err_late = {"sf1": (1.0, 10), "sf2": (1.1, 20), "sf3": (-1.0, -1)}
        err_early = {"sf1": (-1.0, -1), "sf2": (1.1, 20), "sf3": (1.2, 30)}
        quad = {"sf1": (1.0, 10), "sf2": (4.0, 20), "sf3": (9.0, 30)}
        results = {"good": ok, "late": err_late, "early": err_early, "quad": quad}
        bad = mod.curvature_report(results, dirs, list(results))
        capsys.readouterr()
        assert bad == 3

    def test_all_green_returns_zero(self, capsys):
        mod = _load_by_path("scale_rehearsal")
        dirs = ["sf1", "sf2", "sf3"]
        results = {
            "a": {"sf1": (1.0, 5), "sf2": (1.3, 9), "sf3": (1.6, 12)},
            "b": {"sf1": (2.0, 5), "sf2": (2.2, 9), "sf3": (2.5, 12)},
        }
        bad = mod.curvature_report(results, dirs, ["a", "b"])
        capsys.readouterr()
        assert bad == 0


@pytest.mark.slow
@pytest.mark.parametrize(
    "name", ["trend_theilsen_daily_revenue", "eval_quality_vs_lm_corr"]
)
def test_wide_moment_queries_match_oracle_at_sf01(spark, name):
    """Regression pin for the round-6 int64-overflow class: the OLS /
    correlation normal-equation cross-products overflow int64 at data
    magnitudes the sf0.001/sf0.01 suites never reach (n*sxy measured
    1.18x of 2^63 at sf0.1 in trend_theilsen before the DECIMAL(38,0)/
    HUGEINT fix; eval_quality's products scale as n^2 and fail past
    ~5e6 docs). This is the one test in the suite that materializes
    these two queries' VALUES at sf0.1 — .count()-based checks pass
    even when the projection overflows, because Catalyst prunes the
    unconsumed overflowing expression."""
    from kafka_avro_order_processor_eg_4131_spark.catalog import REGISTRY
    from kafka_avro_order_processor_eg_4131_spark.operators import cache as C

    from .oracle_harness import compare_query, duckdb_conn

    sf_dir = "/root/testdata/sf0.1"
    con = duckdb_conn(sf_dir)
    try:
        q = REGISTRY[name]
        res = compare_query(spark, con, name, q.fn, q.oracle, sf_dir)
        assert res.ok, f"{name} @ sf0.1: {res.problems}"
    finally:
        con.close()
        C.release_ephemeral(spark)
