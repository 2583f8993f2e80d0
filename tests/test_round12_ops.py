"""Round-12 pins.

- The INVERSE probes for the round-11 broadcast-cache rule
  ("eager=True iff the relation's consumers BROADCAST it"), with a
  round-12 REFINEMENT of the mechanism found while writing them. The
  round-11 note said "a broadcast's executeCollect does NOT populate
  the lazy persist"; that is TOO BROAD. Measured this round (fresh
  sessions, both sf0.001 and sf0.01):
    * a single broadcast-join consumer of a lazy persist DOES
      populate it (AQE wraps the scan in a TableCacheQueryStage);
    * a 2-branch union of broadcast-join branches (lsh+ivf) DOES
      populate both;
    * the REAL catalog shape — ann_eval_fusion_gain's 3-branch union
      whose third branch (rrf) NESTS the lsh/ivf cached relations
      inside its own cached build — does NOT populate lsh/ivf/rrf
      (re-touch re-runs the builder: 2.4 s vs 0.25-0.47 s cached).
  So the eager=True on the topk families is still load-bearing, and
  the pin here reproduces the REAL failing shape, not a synthetic
  approximation of the mechanism. Three probes:
    (a) the catalog fusion shape skips lazy topk persists (eager is
        required) — if a Spark upgrade makes this fail, the eager
        builds may have become redundant extra jobs;
    (b) a LAZY persist consumed through an ordinary shuffle/aggregate
        path IS fully populated on first use (why the big dedup/text
        families must stay lazy — blanket eager measured ~15 s worse,
        docs/PLANS.md "broadcast-cache finding");
    (c) the boundary: a SIMPLE broadcast-only consumer DOES populate
        — guards the refined wording in the docs.
  All probes use the round-12-advice precision: snapshot
  getRDDStorageInfo by RDD id BEFORE the action and assert on the
  delta, so leftover persisted RDDs from earlier tests in the shared
  session cannot flip the result.

- TWELFTH fixture class: MANY-SMALL-FILES layout — the same sf0.001
  rows re-written as one-row part files (the first 50 rows of every
  table), multiple EMPTY part files (first, middle, and last in
  lexicographic file order), and the remainder in small chunks. The
  combined fixture (eleventh class) carries an 8-way split plus ONE
  empty part file; this class pushes to the file-boundary extreme a
  compacting-free cluster writer produces: rows-per-file == 1, empty
  file FIRST in listing order (schema resolution must not depend on
  the first file being non-empty), and per-table file counts in the
  dozens. Any entry whose result depends on file boundaries, file
  order, or per-file row counts diverges from its oracle here.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kafka_avro_order_processor_eg_4131_spark.operators import cache as C


def _storage_ids(spark) -> dict[int, tuple[int, int]]:
    """RDD id -> (cached partitions, total partitions) for every entry
    the JVM block manager tracks (persisted RDDs, materialized or
    not)."""
    infos = spark.sparkContext._jsc.sc().getRDDStorageInfo()
    return {
        i.id(): (i.numCachedPartitions(), i.numPartitions()) for i in infos
    }


def _fully(ids: dict[int, tuple[int, int]]) -> set[int]:
    return {i for i, (c, t) in ids.items() if t > 0 and c == t}


class TestBroadcastCacheRuleInverseProbes:
    def test_catalog_fusion_shape_skips_lazy_topk_persists(
        self, spark, sf_small, monkeypatch
    ):
        """Leg (a), the REAL failing shape: with every family forced
        lazy, running ann_eval_fusion_gain (3-branch union whose rrf
        branch nests the lsh/ivf caches) must leave the lsh topk
        persist UNMATERIALIZED — proven structurally: a subsequent
        explicit count() on the lsh relation creates a NEW fully-
        cached entry. If that count() adds nothing, fusion_gain
        populated the cache itself and the eager topk builds
        (plans/similarity.py) should be re-evaluated as redundant."""
        import kafka_avro_order_processor_eg_4131_spark.operators.cache as CM
        from kafka_avro_order_processor_eg_4131_spark.catalog import REGISTRY

        orig = CM.family

        def lazy_family(*args, **kwargs):
            # only override eager; forward everything else so a future
            # family() parameter fails loudly instead of being swallowed
            # (round-12 advice)
            kwargs["eager"] = False
            return orig(*args, **kwargs)

        monkeypatch.setattr(CM, "family", lazy_family)
        C.release_families(spark)
        try:
            REGISTRY["ann_eval_fusion_gain"].fn(spark, sf_small).count()
            from kafka_avro_order_processor_eg_4131_spark.plans.similarity import (  # noqa: E501
                _lsh_topk_cached,
            )

            lsh = _lsh_topk_cached(spark, sf_small)  # memoized lazy persist
            before = _fully(_storage_ids(spark))
            lsh.count()
            new_fully = _fully(_storage_ids(spark)) - before
            assert new_fully, (
                "ann_eval_fusion_gain POPULATED the lazy lsh persist — "
                "Spark's nested-cache/union materialization changed; the "
                "eager topk caches may now be a redundant extra job"
            )
        finally:
            C.release_families(spark)
            C.release_ephemeral(spark)

    def test_simple_broadcast_consumer_populates_lazy_persist(self, spark):
        """Leg (c), the boundary pin: a plain broadcast-join consumer
        of a lazily-persisted tiny relation DOES populate it (AQE's
        TableCacheQueryStage) — the round-11 'broadcast never
        populates' wording was too broad, and this pin keeps the
        refined docs honest."""
        tiny = spark.range(0, 50).select(
            F.col("id"), (F.col("id") % 7).alias("bucket")
        ).persist()
        big = spark.range(0, 10_000).select(
            F.col("id").alias("k"), (F.col("id") % 50).alias("id2")
        )
        try:
            before = _fully(_storage_ids(spark))
            n = big.join(
                F.broadcast(tiny), big["id2"] == tiny["id"], "inner"
            ).count()
            assert n == 10_000
            new_fully = _fully(_storage_ids(spark)) - before
            assert new_fully, (
                "a simple broadcast consumer no longer populates a lazy "
                "persist — re-measure the eager-iff-broadcast boundary"
            )
        finally:
            tiny.unpersist()

    def test_shuffle_consumer_fully_populates_lazy_persist(self, spark):
        """Leg (b): an aggregate consumer materializes the lazy persist
        completely on first use — the reason the big shuffle-consumed
        families stay lazy (one job builds AND consumes)."""
        rel = spark.range(0, 10_000).select(
            (F.col("id") % 97).alias("g"), F.col("id").alias("v")
        ).persist()
        try:
            before = _fully(_storage_ids(spark))
            rel.groupBy("g").agg(F.sum("v").alias("s")).count()
            after = _storage_ids(spark)
            new_fully = _fully(after) - before
            assert new_fully, (
                "no NEW fully-cached RDD after a shuffle-consumer action "
                f"over a lazy persist (storage {after}) — lazy families "
                "would now need eager builds"
            )
        finally:
            rel.unpersist()


# ---------------------------------------------------------------------------
# Twelfth fixture class: many-small-files layout
# ---------------------------------------------------------------------------

N_ONE_ROW_FILES = 50
CHUNK_ROWS = 200


def build_many_small_files_fixture(src_dir: str, dst) -> None:
    """Re-write every sf0.001 table as a many-small-part-file
    directory: an EMPTY part file first/middle/last in lexicographic
    order, the first ``N_ONE_ROW_FILES`` rows as one-row files, and
    the remainder in ``CHUNK_ROWS``-row chunks. Row SET is identical
    to ``src_dir`` (parity with the unmodified oracles); only the
    physical layout is hostile."""
    import pyarrow.parquet as pq

    from kafka_avro_order_processor_eg_4131_spark.sources.tables import (
        TABLE_NAMES,
    )

    for name in TABLE_NAMES:
        t = pq.read_table(f"{src_dir}/{name}.parquet")
        tdir = dst / f"{name}.parquet"
        tdir.mkdir()
        seq = 0

        def write(tbl, tag: str) -> None:
            nonlocal seq
            # zero-padded seq => lexicographic == write order
            pq.write_table(tbl, str(tdir / f"part-{seq:04d}-{tag}.parquet"))
            seq += 1

        write(t.slice(0, 0), "empty")  # empty file FIRST in listing
        n_single = min(N_ONE_ROW_FILES, t.num_rows)
        for i in range(n_single):
            write(t.slice(i, 1), "one")
        write(t.slice(0, 0), "empty")  # empty mid-listing
        for start in range(n_single, t.num_rows, CHUNK_ROWS):
            write(t.slice(start, CHUNK_ROWS), "chunk")
        write(t.slice(0, 0), "empty")  # empty LAST in listing


@pytest.fixture(scope="module")
def many_small_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("many_small")
    build_many_small_files_fixture("/root/testdata/sf0.001", d)
    return str(d)


class TestManySmallFilesLayout:
    def test_builder_preserves_row_multiset(self, many_small_dir):
        """Fast integrity pin: per-table file counts hit the hostile
        shape (>= 3 empties, >= N one-row files for big tables) and
        the row multiset is EXACTLY the source's."""
        import os

        import pyarrow.parquet as pq

        from kafka_avro_order_processor_eg_4131_spark.sources.tables import (
            TABLE_NAMES,
        )

        for name in TABLE_NAMES:
            src = pq.read_table(f"/root/testdata/sf0.001/{name}.parquet")
            tdir = os.path.join(many_small_dir, f"{name}.parquet")
            files = sorted(os.listdir(tdir))
            assert sum(1 for f in files if "-empty" in f) == 3, name
            assert files[0].endswith("-empty.parquet"), (
                f"{name}: empty file must be FIRST in listing order"
            )
            n_single = min(N_ONE_ROW_FILES, src.num_rows)
            assert sum(1 for f in files if "-one" in f) == n_single, name
            got = pq.read_table(tdir)
            assert got.num_rows == src.num_rows, name
            # multiset equality via sorted row tuples on a stable str form
            def rows(t):
                return sorted(map(str, t.to_pylist()), key=str)

            assert rows(got) == rows(src), f"{name}: row multiset changed"

    def test_spark_scan_handles_empty_first_file(self, spark, many_small_dir):
        """Schema resolution and counts survive an empty part file
        first in listing order plus one-row files."""
        df = spark.read.parquet(f"{many_small_dir}/orders.parquet")
        import pyarrow.parquet as pq

        src = pq.read_table("/root/testdata/sf0.001/orders.parquet")
        assert df.count() == src.num_rows
        assert sorted(df.columns) == sorted(src.schema.names)

    @pytest.mark.slow
    def test_whole_catalog_oracle_parity_on_many_small_files(
        self, spark, many_small_dir
    ):
        """FULL-PARITY sweep (twelfth fixture class): all 223 entries
        against the many-small-files layout vs unmodified DuckDB
        oracles over the same directories. Green = no entry's result
        depends on file boundaries, per-file row counts, or file
        order — including one-row files and empty files at every
        position in the listing."""
        from tests.test_edge_relational_smoke import _parity_sweep

        C.release_families(spark)
        assert not _parity_sweep(spark, many_small_dir)


class TestWarmConcurrently:
    """Round-12 optimization pins: the concurrent cache warm
    (operators/cache.py::warm_concurrently, guide §2.6) used by the
    ann topk family builds."""

    def test_thunks_all_run_concurrently(self):
        import threading

        seen = []
        lock = threading.Lock()
        # a 4-party barrier only releases if all four thunks are alive
        # AT THE SAME TIME — pins actual concurrency, not just
        # completion (thread idents recycle, so they can't be used)
        barrier = threading.Barrier(4, timeout=30)

        def mk(i):
            def thunk():
                barrier.wait()
                with lock:
                    seen.append(i)
            return thunk

        C.warm_concurrently([mk(i) for i in range(4)])
        assert sorted(seen) == [0, 1, 2, 3]

    def test_first_exception_propagates(self):
        ran = []

        def ok():
            ran.append("ok")

        def boom():
            raise ValueError("warm failed")

        import pytest as _pytest

        with _pytest.raises(ValueError, match="warm failed"):
            C.warm_concurrently([ok, boom, ok])
        # the failing thunk must not cancel the others (join-all first)
        assert ran == ["ok", "ok"]

    def test_fusion_gain_fn_fills_all_four_topk_caches(
        self, spark, sf_small
    ):
        """Constructing ann_eval_fusion_gain's plan (fn only, no
        action) must leave the four eager topk family caches FULLY
        materialized — the round-12 concurrent warm runs at fn time.
        Precision per round-12 advice: snapshot storage ids before and
        assert on the delta of fully-cached entries (>= 5: embeddings
        + brute/ivf/lsh/rrf)."""
        from kafka_avro_order_processor_eg_4131_spark.catalog import REGISTRY

        C.release_families(spark)
        try:
            before = _fully(_storage_ids(spark))
            REGISTRY["ann_eval_fusion_gain"].fn(spark, sf_small)
            new_fully = _fully(_storage_ids(spark)) - before
            assert len(new_fully) >= 5, (
                f"expected >=5 newly materialized caches (embeddings + 4 "
                f"topk), got {len(new_fully)} — the fn-time concurrent "
                "warm regressed"
            )
        finally:
            C.release_families(spark)
            C.release_ephemeral(spark)

    def test_concurrent_same_family_builders_share_one_build(self, spark):
        """Two warm threads racing the SAME family key serialize on the
        per-key build lock and share one persisted result (the property
        that makes warm thunks safe to overlap with dependent builds)."""
        import threading

        calls = []
        lock = threading.Lock()

        def builder():
            with lock:
                calls.append(1)
            return spark.range(10)

        key = "r12.warm.same-key-probe"
        out = []
        C.warm_concurrently(
            [
                lambda: out.append(C.family(spark, key, "/x", builder)),
                lambda: out.append(C.family(spark, key, "/x", builder)),
            ]
        )
        try:
            assert len(calls) == 1, "same-key builders must not race"
            assert out[0] is out[1]
        finally:
            C.release_families(spark)
