"""Round-3 additions: the scale-safe LSH embedding near-dup plan (vs
its all-pairs twin), and the cache-lifecycle discipline (every persist
has an owner; release_all returns the session to zero retained RDDs).
"""

from __future__ import annotations

import pytest

from kafka_avro_order_processor_eg_4131_spark.catalog import REGISTRY
from kafka_avro_order_processor_eg_4131_spark.operators import cache as C
from kafka_avro_order_processor_eg_4131_spark.operators import similarity as S
from kafka_avro_order_processor_eg_4131_spark.plans.dedup import (
    _COS_THRESHOLD,
    _doc_vectors_cached,
)


def _rows(df):
    return sorted((r.id1, r.id2, r.cos) for r in df.collect())


class TestEmbeddingNearDupLSH:
    def test_lsh_matches_allpairs_twin_sf_small(self, spark, sf_small):
        """The registered banded-LSH plan must produce EXACTLY the
        all-pairs result (candidate completeness on the fixture) —
        bit-identical cosines included."""
        lsh = _rows(REGISTRY["dedup_embedding_cosine_pairs"].fn(spark, sf_small))
        twin = _rows(
            S.allpairs_cosine_pairs(
                _doc_vectors_cached(spark, sf_small),
                _COS_THRESHOLD,
                id_col="doc_id",
                vec_col="vec",
            )
        )
        assert lsh == twin
        assert len(lsh) > 0  # the fixture plants real near-dups

    def test_lsh_matches_allpairs_twin_sf_oracle(self, spark, sf_oracle):
        lsh = _rows(REGISTRY["dedup_embedding_cosine_pairs"].fn(spark, sf_oracle))
        twin = _rows(
            S.allpairs_cosine_pairs(
                _doc_vectors_cached(spark, sf_oracle),
                _COS_THRESHOLD,
                id_col="doc_id",
                vec_col="vec",
            )
        )
        assert lsh == twin and len(lsh) > 0

    @pytest.mark.slow
    def test_lsh_matches_allpairs_twin_sf01(self, spark):
        sf = "/root/testdata/sf0.1"
        lsh = _rows(REGISTRY["dedup_embedding_cosine_pairs"].fn(spark, sf))
        twin = _rows(
            S.allpairs_cosine_pairs(
                _doc_vectors_cached(spark, sf),
                _COS_THRESHOLD,
                id_col="doc_id",
                vec_col="vec",
            )
        )
        assert lsh == twin and len(lsh) > 0

    def test_pairs_are_ordered_and_above_threshold(self, spark, sf_small):
        rows = _rows(REGISTRY["dedup_embedding_cosine_pairs"].fn(spark, sf_small))
        assert all(a < b for a, b, _ in rows)
        assert all(c >= _COS_THRESHOLD for _, _, c in rows)
        assert len(rows) == len({(a, b) for a, b, _ in rows})  # distinct


class TestCacheLifecycle:
    def test_release_all_frees_everything_this_block_persisted(
        self, spark, sf_small
    ):
        """After materializing queries that exercise family caches,
        kernel persists, and LSH buckets, release_all() must free every
        RDD those queries pinned (round-2 verdict #2). Set-based so
        unrelated retained blocks from earlier tests in the shared
        session (e.g. localCheckpoints awaiting the ContextCleaner)
        don't leak into the assertion."""
        C.release_all()
        before = C.retained_rdd_ids(spark)
        # exercises: dedup family caches + LSH ephemeral buckets
        REGISTRY["dedup_minhash_candidates"].fn(spark, sf_small).count()
        # exercises: the two-pass kernel's pid-stamped ephemeral persist
        # (latency_pctiles moved to the histogram plan in round 5, so a
        # query still on distributed_row_number carries this leg)
        REGISTRY["median_price_by_segment"].fn(spark, sf_small).count()
        # exercises: the new doc-vector family + lsh_near_pairs ephemeral
        REGISTRY["dedup_embedding_cosine_pairs"].fn(spark, sf_small).count()
        added = C.retained_rdd_ids(spark) - before
        assert added, "queries should have pinned relations"
        C.release_all()
        assert not (C.retained_rdd_ids(spark) & added)

    def test_release_ephemeral_keeps_families(self, spark, sf_small):
        C.release_all()
        before = C.retained_rdd_ids(spark)
        REGISTRY["dedup_minhash_candidates"].fn(spark, sf_small).count()
        added = C.retained_rdd_ids(spark) - before
        assert added
        C.release_ephemeral()
        survivors = C.retained_rdd_ids(spark) & added
        # family caches (shingles, sigs, candidates) survive the sweep;
        # the ephemeral bucket relation does not
        assert survivors and survivors < added
        C.release_families(spark)
        assert not (C.retained_rdd_ids(spark) & added)

    def test_family_returns_same_object_and_rebuilds_after_release(
        self, spark, sf_small
    ):
        calls = {"n": 0}

        def build():
            calls["n"] += 1
            return spark.range(10).toDF("x")

        a = C.family(spark, "test.lifecycle", sf_small, build)
        b = C.family(spark, "test.lifecycle", sf_small, build)
        assert a is b and calls["n"] == 1
        C.release_families(spark)
        C.family(spark, "test.lifecycle", sf_small, build)
        assert calls["n"] == 2
        C.release_families(spark)

    def test_memo_shared_and_cleared_with_families(self, spark, sf_small):
        calls = {"n": 0}

        def build():
            calls["n"] += 1
            return ("anything", 42)

        a = C.memo(spark, "test.memo", sf_small, build)
        b = C.memo(spark, "test.memo", sf_small, build)
        assert a is b and calls["n"] == 1
        C.release_families(spark)
        C.memo(spark, "test.memo", sf_small, build)
        assert calls["n"] == 2
        C.release_families(spark)


class TestBfsFrontier:
    def test_frontier_matches_spark_recursive_cte(self, spark, sf_small):
        """The registered frontier-dedup BFS must equal the declarative
        Spark 4 WITH RECURSIVE walk it replaced (which survives as the
        DuckDB oracle) — this also keeps the Spark recursive-CTE
        surface exercised. Unique view name per run (advice r2: the old
        fixed-name global view raced concurrent invocations)."""
        import uuid

        from pyspark.sql import functions as F

        from kafka_avro_order_processor_eg_4131_spark.catalog import load
        from kafka_avro_order_processor_eg_4131_spark.plans.relational import (
            _BFS_MAX_HOPS,
            _KCORE_MOD,
        )

        frontier = sorted(
            (r.node, r.hops)
            for r in REGISTRY["graph_bfs_hops_recursive"].fn(spark, sf_small).collect()
        )

        li = (
            load(spark, sf_small, "lineitem")
            .filter(F.col("l_orderkey") % _KCORE_MOD == 0)
            .select("l_orderkey", "l_partkey")
            .distinct()
        )
        und = (
            li.alias("a")
            .join(
                li.alias("b"),
                (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
                & (F.col("a.l_partkey") != F.col("b.l_partkey")),
            )
            .select(F.col("a.l_partkey").alias("src"), F.col("b.l_partkey").alias("dst"))
            .distinct()
            .localCheckpoint()
        )
        view = f"bfs_edges_{uuid.uuid4().hex}"
        und.createOrReplaceTempView(view)
        try:
            cte = sorted(
                (r.node, r.hops)
                for r in spark.sql(f"""
                    WITH RECURSIVE walk(node, dist) AS (
                      SELECT (SELECT MIN(src) FROM {view}), 0
                      UNION ALL
                      SELECT e.dst, w.dist + 1
                      FROM walk w JOIN {view} e ON e.src = w.node
                      WHERE w.dist < {_BFS_MAX_HOPS}
                    )
                    SELECT node, CAST(MIN(dist) AS INT) AS hops
                    FROM walk GROUP BY node
                """).collect()
            )
        finally:
            spark.catalog.dropTempView(view)
        assert frontier == cte and len(frontier) > 1


class TestSketchOutputsPinned:
    """The two rows-only catalog entries (native percentile_approx /
    approx_count_distinct sketches) have no SQL oracle BY NATURE — their
    outputs are implementation-defined by Spark's GK/HLL++ internals
    (xxhash64 + bias tables DuckDB cannot reproduce). The semantic
    surface IS oracle-checked via the from-scratch md5-register HLL and
    count-min sketches in plans/sketches.py; here the native outputs
    are pinned as exact literals per SF so an engine upgrade that shifts
    them is caught loudly (round-2 verdict #7)."""

    PINNED = {
        ("sf0.001", "agg_percentile_approx"): [
            ("F", 242707.75), ("O", 253356.63), ("P", 258770.68)],
        ("sf0.001", "agg_approx_count_distinct"): [
            ("F", 146), ("O", 150), ("P", 146)],
        ("sf0.01", "agg_percentile_approx"): [
            ("F", 251601.6), ("O", 251271.81), ("P", 251195.71)],
        ("sf0.01", "agg_approx_count_distinct"): [
            ("F", 1361), ("O", 1369), ("P", 1367)],
    }

    @pytest.mark.parametrize("sf,name", sorted(PINNED))
    def test_pinned(self, spark, sf, name):
        rows = sorted(
            tuple(r)
            for r in REGISTRY[name].fn(spark, f"/root/testdata/{sf}").collect()
        )
        assert rows == self.PINNED[(sf, name)]


class TestBpeTraining:
    def test_matches_pure_python_bpe(self, spark, sf_small):
        """The distributed merge table must equal a from-first-principles
        Python BPE trainer over the same vocabulary (greedy within-round
        non-overlapping merges, (count desc, lhs, rhs) tie-break)."""
        import re
        from collections import Counter

        import duckdb

        got = [
            (r.rnd, r.lhs, r.rhs, r.merged, r.pair_count)
            for r in REGISTRY["bpe_train_merges"].fn(spark, sf_small).collect()
        ]

        con = duckdb.connect()
        rows = con.execute(
            f"SELECT text FROM '{sf_small}/documents.parquet'"
            " WHERE trim(text) <> ''"
        ).fetchall()
        vocab = Counter()
        for (text,) in rows:
            for w in re.split(r"\s+", text.strip().lower()):
                if w and "|" not in w:
                    vocab[w] += 1
        seqs = {w: list(w) for w in vocab}

        expected = []
        for rnd in range(1, 4):
            pairs = Counter()
            for w, cnt in vocab.items():
                s = seqs[w]
                for i in range(len(s) - 1):
                    pairs[(s[i], s[i + 1])] += cnt
            (lhs, rhs), n = min(
                pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
            )
            expected.append((rnd, lhs, rhs, lhs + rhs, n))
            for w, s in seqs.items():
                out, i = [], 0
                while i < len(s):
                    if i + 1 < len(s) and s[i] == lhs and s[i + 1] == rhs:
                        out.append(lhs + rhs)
                        i += 2
                    else:
                        out.append(s[i])
                        i += 1
                seqs[w] = out
        assert got == expected

    def test_apply_merge_edge_cases(self, spark):
        from pyspark.sql import functions as F

        from kafka_avro_order_processor_eg_4131_spark.operators.bpe import (
            apply_merge,
        )

        df = spark.createDataFrame(
            [(["a", "a", "a", "a"],), (["a", "b", "a", "a", "a"],), (["a"],)],
            "seq array<string>",
        )
        out = [
            r.m
            for r in df.select(
                apply_merge(F.col("seq"), F.lit("a"), F.lit("a")).alias("m")
            ).collect()
        ]
        assert out == [["aa", "aa"], ["a", "b", "aa", "a"], ["a"]]


class TestSemDedup:
    def test_keep_list_structure(self, spark, sf_oracle):
        rows = [
            (r.doc_id, r.cell_id, r.kept)
            for r in REGISTRY["semdedup_keep_list"].fn(spark, sf_oracle).collect()
        ]
        assert len(rows) == len({d for d, _, _ in rows})  # one row per doc
        assert {k for _, _, k in rows} <= {0, 1}
        assert sum(1 for _, _, k in rows if k == 0) > 0  # fixture has dups
        # the lowest doc_id in every cell can never be dropped (no lower
        # cellmate exists to drop it against)
        by_cell = {}
        for d, c, k in rows:
            by_cell.setdefault(c, []).append((d, k))
        for c, members in by_cell.items():
            d_min, k_min = min(members)
            assert k_min == 1, (c, d_min)


class TestSurvivalKM:
    def test_km_curve_properties(self, spark, sf_oracle):
        rows = REGISTRY["survival_km_churn"].fn(spark, sf_oracle).collect()
        assert len(rows) > 10
        ts = [r.t for r in rows]
        assert ts == sorted(ts) and len(ts) == len(set(ts))
        survs = [r.surv for r in rows]
        assert all(0.0 < s <= 1.0 for s in survs)
        assert all(a >= b for a, b in zip(survs, survs[1:]))  # non-increasing
        # at-risk counts shrink over time; events never exceed at-risk
        assert all(r.n_events <= r.n_risk for r in rows)
        n_risks = [r.n_risk for r in rows]
        assert all(a >= b for a, b in zip(n_risks, n_risks[1:]))
        # first factor: S(t1) = 1 - d1/n1 exactly
        f = rows[0]
        assert f.surv == 1.0 - f.n_events / f.n_risk


class TestRrfFusion:
    def test_fused_ranks_and_scores(self, spark, sf_oracle):
        rows = REGISTRY["ann_rrf_fusion"].fn(spark, sf_oracle).collect()
        by_q = {}
        for r in rows:
            by_q.setdefault(r.query_id, []).append((r.rank, r.rrf, r.neighbor_id))
        assert len(by_q) == 20  # every query produced a fused list
        for q, lst in by_q.items():
            lst.sort()
            assert [r for r, _, _ in lst] == list(range(1, len(lst) + 1))
            scores = [s for _, s, _ in lst]
            assert all(a >= b for a, b in zip(scores, scores[1:]))
            # rrf scores are sums of one or two reciprocal terms in
            # (0, 2/61]
            assert all(0 < s <= 2.0 / 61.0 + 1e-12 for s in scores)


class TestSketchMergeAndFusionGain:
    def test_hll_merge_is_lossless(self, spark, sf_oracle):
        [r] = REGISTRY["sketch_hll_merge_sources"].fn(spark, sf_oracle).collect()
        assert r.n_sources == 5
        assert r.n_mismatches == 0
        assert r.merged_estimate == r.global_estimate  # bit-identical

    def test_rrf_fusion_beats_each_component(self, spark, sf_oracle):
        rows = {
            r.retriever: r.mean_recall_at_k
            for r in REGISTRY["ann_eval_fusion_gain"].fn(spark, sf_oracle).collect()
        }
        assert set(rows) == {"ivf", "lsh", "rrf"}
        # on the fixture the fused list strictly improves on both
        # single indexes (0.74 vs 0.64 / 0.53 at sf0.01)
        assert rows["rrf"] >= max(rows["ivf"], rows["lsh"])


class TestTheilSen:
    def test_matches_pure_python_reference(self, spark, sf_small):
        import duckdb

        [r] = (
            REGISTRY["trend_theilsen_daily_revenue"].fn(spark, sf_small).collect()
        )
        con = duckdb.connect()
        rows = con.execute(
            f"""SELECT o_orderdate,
                       CAST(SUM(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT)) AS BIGINT)
                FROM '{sf_small}/orders.parquet' GROUP BY 1 ORDER BY 1"""
        ).fetchall()
        d0 = rows[0][0]
        pts = [((day - d0).days, cents) for day, cents in rows]
        slopes = sorted(
            (
                (yj - yi) / (xj - xi),
                xi,
                xj,
            )
            for i, (xi, yi) in enumerate(pts)
            for xj, yj in pts[i + 1:]
        )
        n = len(slopes)
        lo, hi = slopes[(n + 1) // 2 - 1][0], slopes[n // 2][0]
        assert r.n_days == len(pts)
        assert r.theilsen_slope_cents_per_day == (lo + hi) / 2.0
        sx = sum(x for x, _ in pts)
        sy = sum(y for _, y in pts)
        sxy = sum(x * y for x, y in pts)
        sxx = sum(x * x for x, y in pts)
        m = len(pts)
        assert r.ols_slope_cents_per_day == (m * sxy - sx * sy) / (m * sxx - sx * sx)


class TestGraphOperatorUnits:
    def test_bfs_hops_on_known_graph(self, spark):
        """Hand-built graph: 1-2-3-4 chain plus a 2-5 branch and a
        disconnected 8-9 pair; seed = min src = 1. Cycle via 3-1 edge
        must not revisit."""
        from pyspark.sql import functions as F

        from kafka_avro_order_processor_eg_4131_spark.operators.graph import (
            bfs_hops,
        )

        pairs = [(1, 2), (2, 3), (3, 4), (2, 5), (3, 1), (8, 9)]
        edges = spark.createDataFrame(
            pairs + [(b, a) for a, b in pairs], "src long, dst long"
        ).localCheckpoint()
        got = {
            r.node: r.hops
            for r in bfs_hops(edges, 10).select("node", "hops").collect()
        }
        assert got == {1: 0, 2: 1, 3: 1, 4: 2, 5: 2}  # 8,9 unreachable

    def test_bfs_hops_respects_max_hops(self, spark):
        from kafka_avro_order_processor_eg_4131_spark.operators.graph import (
            bfs_hops,
        )

        pairs = [(1, 2), (2, 3), (3, 4)]
        edges = spark.createDataFrame(
            pairs + [(b, a) for a, b in pairs], "src long, dst long"
        ).localCheckpoint()
        got = {r.node: r.hops for r in bfs_hops(edges, 2).collect()}
        assert got == {1: 0, 2: 1, 3: 2}  # 4 is 3 hops away — excluded


class TestLshNearPairsUnit:
    def test_synthetic_planted_pair(self, spark):
        """Tiny synthetic corpus: two near-identical vectors among
        orthogonal noise must be the ONLY pair found, matching the
        all-pairs twin exactly."""
        from pyspark.sql import functions as F

        from kafka_avro_order_processor_eg_4131_spark.operators import (
            similarity as S,
        )

        dim = 16
        rows = []
        for i in range(dim):  # mutually orthogonal one-hot noise
            v = [0.0] * dim
            v[i] = 1.0 + i * 0.01
            rows.append((i, v))
        planted = [0.0] * dim
        planted[0], planted[1] = 1.0, 0.5
        near = list(planted)
        near[1] = 0.51
        rows.append((100, planted))
        rows.append((101, near))
        emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        planes = S.lsh_planes(emb, 2, 3)
        bucketed = S.lsh_bucket(emb, planes)
        lsh = sorted(
            (r.id1, r.id2, r.cos)
            for r in S.lsh_near_pairs(bucketed, 0.99).collect()
        )
        twin = sorted(
            (r.id1, r.id2, r.cos)
            for r in S.allpairs_cosine_pairs(emb, 0.99).collect()
        )
        assert lsh == twin
        assert [(a, b) for a, b, _ in lsh] == [(100, 101)]
