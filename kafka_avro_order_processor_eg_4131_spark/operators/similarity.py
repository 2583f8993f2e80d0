"""Similarity search over embedding columns (north-star extension).

Two execution paths:
- ``brute_force_topk``: exact cosine top-k via join + window. The join
  is query-set x corpus — fine when the query set is small or blocked;
  this is the correctness baseline every ANN variant is validated
  against.
- ``lsh_topk``: multi-table sign LSH — ``num_tables`` independent
  ``bits_per_table``-bit bucketings; candidates are pairs sharing a
  bucket in any table (union amplifies recall, narrow buckets bound
  cost). At 100 TB the bucket join replaces the quadratic cross join.
  Hyperplanes are differences of consecutive leading corpus vectors,
  so the whole pipeline is deterministic and oracle-checkable — a
  production variant would draw Gaussian planes from a fixed seed.

Also ``numpy_topk_batch``: the Arrow/pandas-UDF formulation (numpy
matmul per batch) — the throughput path when dimensions grow; results
match brute force to float tolerance (numpy's pairwise summation
reorders adds, so it is NOT bit-identical — validated in tests, not
against the SQL oracle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.vectors import cosine, dot
from . import cache

TOP_K = 5


def _spread(df: DataFrame, width: int | None) -> DataFrame:
    """Repartition to ``width`` (default: cluster parallelism x2) unless
    the relation already has that layout — lets a family-level cached
    relation (plans/similarity.py) flow through without a redundant
    shuffle. Plans size ``width`` to the data (rows/250, capped at the
    cluster default), the same adaptive-parts move as
    operators/dedup.py::connected_components: at 100 TB the cap rules,
    at fixture scale task-scheduling overhead stops dominating."""
    target = width or df.sparkSession.sparkContext.defaultParallelism * 2
    if df.rdd.getNumPartitions() == target:
        return df
    return df.repartition(target)


def _dense_index_small(
    df: DataFrame, id_col: str, vec_col: str, n: int, idx_name: str
) -> DataFrame:
    """0-based dense index over the first ``n`` rows by ``id_col``:
    TakeOrdered + one tiny sort-aggregate (collect_list -> array_sort ->
    posexplode). ``n`` must be small (plane/centroid counts — tens of
    rows); for corpus-sized dense indexes use
    operators/ranking.py::distributed_row_number. A global
    ``row_number().over(Window.orderBy(...))`` would be correct here
    too, but plants a single-partition WindowExec in every ANN plan —
    this shape keeps the catalog free of partition-less windows."""
    lead = df.orderBy(id_col).limit(n)
    packed = lead.agg(
        F.array_sort(
            F.collect_list(
                F.struct(F.col(id_col).alias("k"), F.col(vec_col).alias("v"))
            )
        ).alias("a")
    )
    return packed.select(F.posexplode("a").alias(idx_name, "s")).select(
        idx_name, F.col("s.v").alias(vec_col)
    )


def _pairwise_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int,
    id_col: str,
    vec_col: str,
    width: int | None,
    other_id: str,
    label_col: str | None = None,
) -> DataFrame:
    """Shared broadcast nested-loop + per-query top-k core: score every
    (query, corpus) pair by cosine and keep the top k per query. With
    ``label_col`` set, pairs are restricted to DIFFERENT labels (and the
    labels are projected through); otherwise self-pairs are excluded.
    Ties broken by the corpus id — fully deterministic."""
    from ..functions.vectors import norm

    q_cols = [
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qvec"),
        norm(F.col(vec_col)).alias("qnrm"),
    ]
    # corpus side carries the parallelism of the nested-loop join (the
    # small query set is broadcast); widen it and precompute norms once
    c_cols = [
        F.col(id_col).alias(other_id),
        F.col(vec_col).alias("cvec"),
        norm(F.col(vec_col)).alias("cnrm"),
    ]
    out = ["query_id", other_id]
    if label_col is not None:
        other_label = other_id.rsplit("_", 1)[0] + "_label"
        q_cols.insert(1, F.col(label_col).alias("query_label"))
        c_cols.insert(1, F.col(label_col).alias(other_label))
        out = ["query_id", "query_label", other_id, other_label]
    q = queries.select(*q_cols)
    c = _spread(emb, width).select(*c_cols)
    pred = (
        F.col("query_label") != F.col(other_label)
        if label_col is not None
        else F.col("query_id") != F.col(other_id)
    )
    scored = q.crossJoin(c).filter(pred).select(
        *out,
        F.try_divide(
            dot(F.col("qvec"), F.col("cvec")), F.col("qnrm") * F.col("cnrm")
        ).alias("cos"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col(other_id))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
    )


def brute_force_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = TOP_K,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    width: int | None = None,
) -> DataFrame:
    """Exact top-k neighbors (cosine) of each query vector, self excluded.
    Ties broken by neighbor id — fully deterministic."""
    return _pairwise_topk(emb, queries, k, id_col, vec_col, width, "neighbor_id")


NUM_TABLES = 4
BITS_PER_TABLE = 4


def lsh_planes(emb: DataFrame, num_tables: int, bits_per_table: int,
               id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Difference-pair hyperplanes: plane j separates along
    ``vec[2j] - vec[2j+1]`` (consecutive leading corpus vectors by id).
    Differences of clustered data vectors point *between* clusters, so
    they split the corpus far better than raw (all-same-side-ish) data
    vectors. The plane itself is never materialized: sign(dot(v, a-b))
    == sign(dot(v,a) - dot(v,b)), which keeps the SQL oracle a pair of
    left-fold dots. Returns (table_id, bit_id, p1, p2)."""
    # packing bound: lsh_bucket sums bit*2^bit_id via pow(2.0, bit_id),
    # exact only while every power of two fits a double's 53-bit
    # mantissa (same guard family as the KS 2^31 check).
    assert bits_per_table <= 52, (
        f"bits_per_table={bits_per_table} exceeds the exact-double "
        "2^52 bucket-packing bound"
    )
    lead = _dense_index_small(
        emb, id_col, vec_col, 2 * num_tables * bits_per_table, "rn"
    )
    # floor-div everywhere: plain `/` is double division in BOTH engines,
    # but double->int CAST truncates in Spark and rounds in DuckDB
    a = lead.filter(F.col("rn") % 2 == 0).select(
        F.floor(F.col("rn") / 2).alias("pair_id"), F.col(vec_col).alias("p1")
    )
    b = lead.filter(F.col("rn") % 2 == 1).select(
        F.floor(F.col("rn") / 2).alias("pair_id"),
        F.col(vec_col).alias("p2"),
    )
    return a.join(b, "pair_id").select(
        F.floor(F.col("pair_id") / bits_per_table).cast("int").alias("table_id"),
        (F.col("pair_id") % bits_per_table).cast("int").alias("bit_id"),
        "p1",
        "p2",
    )


def lsh_bucket(emb: DataFrame, planes: DataFrame,
               id_col: str = "vec_id", vec_col: str = "embedding",
               width: int | None = None) -> DataFrame:
    """Assign each vector one bucket per hash table: bit j of table t is
    (dot(v, p1) - dot(v, p2) >= 0). ``planes`` must be small (broadcast,
    one row per (table, bit)) and fully determines the table count — no
    separate num_tables knob, so the plan shape can't drift from the
    plane relation. Returns (id, vec, table_id, bucket).

    Shape: the per-(vector, plane) bit terms stay a flat codegen'd
    projection (a nested higher-order formulation was A/B'd and LOSES
    2.4x — deep HOF nesting kicks the dot folds out of whole-stage
    codegen), but the bits shuffle NARROW (id, table_id, term) rows
    and the vector re-attaches by an id equi-join afterward. Round-2
    shipped the same groupBy with the 64-double vector both ON every
    shuffled row and IN the grouping key — hundreds of MB of shuffle
    and 512-byte key hashing for nothing."""
    v = _spread(emb, width).select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("vec")
    )
    bits = v.crossJoin(F.broadcast(planes)).select(
        "id",
        "table_id",
        F.when(
            dot(F.col("vec"), F.col("p1")) - dot(F.col("vec"), F.col("p2")) >= 0,
            # 2^bit_id as exact long (pow is exact for powers of two
            # below 2^53)
            F.pow(F.lit(2.0), F.col("bit_id")).cast("long"),
        )
        .otherwise(F.lit(0).cast("long"))
        .alias("term"),
    )
    buckets = bits.groupBy("id", "table_id").agg(
        F.sum("term").cast("long").alias("bucket")
    )
    return buckets.join(v, "id").select("id", "vec", "table_id", "bucket")


def lsh_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = TOP_K,
    num_tables: int = NUM_TABLES,
    bits_per_table: int = BITS_PER_TABLE,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    width: int | None = None,
) -> DataFrame:
    """Approximate top-k via multi-table sign-LSH: candidates are pairs
    sharing a bucket in ANY of the ``num_tables`` hash tables (union —
    the standard recall amplifier: one table at 4 bits recalls ~0.1 on
    the fixture embeddings, four tables ~0.5), then exact cosine
    ranking over the DISTINCT candidate set.

    Scale: bits_per_table should grow ~log2(corpus/target_bucket_size)
    so per-bucket candidate lists stay bounded; the bucket join then
    replaces the quadratic cross join at any corpus size."""
    planes = lsh_planes(emb, num_tables, bits_per_table, id_col, vec_col)
    # persisted: the bucketed relation feeds BOTH sides of the
    # candidate join; without it the num_tables-dot bucketing runs
    # twice (ephemeral: harness-released after materialization)
    bucketed = cache.ephemeral(
        lsh_bucket(emb, planes, id_col, vec_col, width)
    )
    q = queries.select(F.col(id_col).alias("query_id")).join(
        bucketed.select(
            F.col("id").alias("query_id"),
            F.col("vec").alias("qvec"),
            F.col("table_id").alias("qtable"),
            F.col("bucket").alias("qbucket"),
        ),
        "query_id",
    )
    c = bucketed.select(
        F.col("id").alias("neighbor_id"),
        F.col("vec").alias("cvec"),
        F.col("table_id").alias("ctable"),
        F.col("bucket").alias("cbucket"),
    )
    scored = (
        q.join(
            c,
            (F.col("qtable") == F.col("ctable"))
            & (F.col("qbucket") == F.col("cbucket")),
        )
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine(F.col("qvec"), F.col("cvec")).alias("cos"),
        )
        .distinct()  # the same pair can collide in several tables
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w).cast("int")).filter(
        F.col("rank") <= k
    )


def lsh_near_pairs(
    bucketed: DataFrame,
    threshold: float,
) -> DataFrame:
    """Near-duplicate pairs by cosine >= ``threshold`` from a sign-LSH
    bucketed relation (the output of ``lsh_bucket``: one row per
    (id, vec, table_id, bucket)): candidates are pairs sharing a bucket
    in ANY table — a (table_id, bucket) equi-self-join, never the
    O(n^2) cross product. The candidate join carries ONLY ids (the
    64-dim vectors stay out of the shuffle), the multi-table collision
    duplicates collapse with a distinct on the narrow (id1, id2) rows,
    and exact cosine verification runs ONCE per unique pair after
    re-attaching vectors by id equi-joins (AQE broadcasts the vector
    relation while it fits; at corpus scale they are plain linear
    shuffle joins). The old shape computed the cosine per COLLISION —
    up to num_tables times per pair — and shuffled the vectors through
    the candidate join; dedup-before-verify cut the registered query
    ~2x at sf0.1.

    Candidate completeness is empirical (sign-LSH has no recall
    guarantee); the all-pairs twin ``allpairs_cosine_pairs`` pins it in
    tests. At corpus scale bits_per_table grows ~log2(n/bucket_size) so
    per-bucket lists stay bounded and the join stays linear-ish."""
    from ..functions.vectors import norm

    # persisted: the bucketed relation feeds the two candidate sides
    # AND the vector re-attach (ephemeral: harness-released)
    sides = cache.ephemeral(bucketed)
    cand = (
        sides.select(F.col("id").alias("id1"), "table_id", "bucket")
        .join(
            sides.select(F.col("id").alias("id2"), "table_id", "bucket"),
            ["table_id", "bucket"],
        )
        .filter(F.col("id1") < F.col("id2"))
        .select("id1", "id2")
        .distinct()
    )
    # one (id, vec) row per id: every id appears exactly once per table
    vecs = sides.filter(F.col("table_id") == 0).select("id", "vec").withColumn(
        "nrm", norm(F.col("vec"))
    )
    v1 = vecs.select(
        F.col("id").alias("id1"), F.col("vec").alias("v1"), F.col("nrm").alias("n1")
    )
    v2 = vecs.select(
        F.col("id").alias("id2"), F.col("vec").alias("v2"), F.col("nrm").alias("n2")
    )
    return (
        cand.join(v1, "id1")
        .join(v2, "id2")
        .select(
            "id1",
            "id2",
            F.try_divide(
                dot(F.col("v1"), F.col("v2")), F.col("n1") * F.col("n2")
            ).alias("cos"),
        )
        .filter(F.col("cos") >= threshold)
    )


def lsh_near_pairs_fused(
    emb: DataFrame,
    planes: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """``lsh_near_pairs`` with the shuffle budget cut to the bone —
    the round-5 A/B winner (2.7x over bucket+near_pairs at sf0.1,
    bit-identical output):

    - buckets carry NO vectors: the (id, table_id, term) bit rows
      groupBy straight into (id, table_id, bucket) with no join-back
      (``lsh_bucket`` re-attaches the vector because ``lsh_topk`` needs
      it; the near-pair verify can fetch vectors from ``emb`` itself);
    - the candidate self-join runs on those narrow rows;
    - NO multi-million-row candidate ``distinct``: with T tables the
      distinct only collapsed ~1.5x of the collisions (measured) but
      cost a full extra shuffle of the candidate set. Instead the
      cosine is verified per COLLISION — the vector attach is an id
      equi-join against ``emb`` that AQE converts to a broadcast-hash
      join while the corpus fits (verified: no hint needed; at corpus
      scale it degrades to a plain shuffle join, at which point the
      distinct-first shape of ``lsh_near_pairs`` wins again — both are
      kept for exactly that reason) — and the ``distinct`` runs on the
      few SURVIVING (id1, id2, cos) rows, where colliding duplicates
      carry bit-identical cosines (same fold over the same arrays).

    Total: 2 wide shuffles (bucket groupBy, candidate join) vs 4-5.
    Candidate completeness is empirical, pinned by the all-pairs twins
    at three SFs (tests/test_round3_ops.py)."""
    from ..functions.vectors import norm

    e = emb.select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("vec"),
        norm(F.col(vec_col)).alias("nrm"),
    ).filter(F.col("nrm") > 0)
    bits = e.crossJoin(F.broadcast(planes)).select(
        "id",
        "table_id",
        F.when(
            dot(F.col("vec"), F.col("p1")) - dot(F.col("vec"), F.col("p2")) >= 0,
            # 2^bit_id as exact long (pow exact for powers of two below
            # 2^53; lsh_planes asserts bits_per_table <= 52)
            F.pow(F.lit(2.0), F.col("bit_id")).cast("long"),
        )
        .otherwise(F.lit(0).cast("long"))
        .alias("term"),
    )
    buckets = cache.ephemeral(
        bits.groupBy("id", "table_id").agg(F.sum("term").cast("long").alias("bucket"))
    )
    v1 = e.select(F.col("id").alias("id1"), F.col("vec").alias("v1"), F.col("nrm").alias("n1"))
    v2 = e.select(F.col("id").alias("id2"), F.col("vec").alias("v2"), F.col("nrm").alias("n2"))
    return (
        buckets.select(F.col("id").alias("id1"), "table_id", "bucket")
        .join(
            buckets.select(F.col("id").alias("id2"), "table_id", "bucket"),
            ["table_id", "bucket"],
        )
        .filter(F.col("id1") < F.col("id2"))
        .join(v1, "id1")
        .join(v2, "id2")
        .select(
            "id1",
            "id2",
            F.try_divide(
                dot(F.col("v1"), F.col("v2")), F.col("n1") * F.col("n2")
            ).alias("cos"),
        )
        .filter(F.col("cos") >= threshold)
        .distinct()
    )


def allpairs_cosine_pairs(
    emb: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact all-pairs cosine near-dup — the O(n^2) oracle twin used by
    TESTS to pin ``lsh_near_pairs``'s candidate completeness on the
    fixtures. Deliberately NOT a catalog plan: the quadratic self-join
    is a scale trap (round-2 verdict)."""
    from ..functions.vectors import norm

    e = emb.select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("vec"),
        norm(F.col(vec_col)).alias("nrm"),
    ).filter(F.col("nrm") > 0)
    a, b = e.alias("a"), e.alias("b")
    return (
        a.join(b, F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id1"),
            F.col("b.id").alias("id2"),
            F.try_divide(
                dot(F.col("a.vec"), F.col("b.vec")),
                F.col("a.nrm") * F.col("b.nrm"),
            ).alias("cos"),
        )
        .filter(F.col("cos") >= threshold)
    )


NUM_CELLS = 8
NUM_PROBES = 2


def ivf_assign(emb: DataFrame, centroids: DataFrame, n_probe: int = 1,
               id_col: str = "vec_id", vec_col: str = "embedding",
               width: int | None = None) -> DataFrame:
    """IVF cell assignment: each vector joins its ``n_probe`` highest-
    cosine centroids. Centroids must be small (broadcast)."""
    from ..functions.vectors import norm as vnorm

    c = centroids.select(
        F.col("cell_id"), F.col(vec_col).alias("cvec"), vnorm(F.col(vec_col)).alias("cnrm")
    )
    scored = (
        _spread(emb, width)
        .select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec"),
                vnorm(F.col(vec_col)).alias("vnrm"))
        .crossJoin(F.broadcast(c))
        .select(
            "id", "vec",
            "cell_id",
            F.try_divide(dot(F.col("vec"), F.col("cvec")), F.col("vnrm") * F.col("cnrm")).alias("aff"),
        )
    )
    w = Window.partitionBy("id").orderBy(F.col("aff").desc(), F.col("cell_id"))
    return (
        scored.withColumn("cell_rank", F.row_number().over(w))
        .filter(F.col("cell_rank") <= n_probe)
        .select("id", "vec", "cell_id")
    )


def ivf_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = TOP_K,
    num_cells: int = NUM_CELLS,
    n_probe: int = NUM_PROBES,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    width: int | None = None,
) -> DataFrame:
    """IVF (inverted-file) ANN: corpus vectors indexed into their single
    nearest cell; queries probe their ``n_probe`` nearest cells and rank
    exactly within them. Centroids = the first ``num_cells`` corpus
    vectors by id (deterministic, oracle-checkable; production would
    k-means from a seed — the plan shape is identical)."""
    from ..functions.vectors import norm as vnorm

    centroids = _dense_index_small(emb, id_col, vec_col, num_cells, "cell_id")
    corpus_cells = ivf_assign(emb, centroids, n_probe=1, id_col=id_col,
                              vec_col=vec_col, width=width)
    query_cells = ivf_assign(
        queries, centroids, n_probe=n_probe, id_col=id_col, vec_col=vec_col,
        width=width,
    )
    q = query_cells.select(
        F.col("id").alias("query_id"), F.col("vec").alias("qvec"),
        vnorm(F.col("vec")).alias("qnrm"), "cell_id",
    )
    c = corpus_cells.select(
        F.col("id").alias("neighbor_id"), F.col("vec").alias("cvec"),
        vnorm(F.col("vec")).alias("cnrm"), "cell_id",
    )
    scored = (
        q.join(c, "cell_id")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.try_divide(dot(F.col("qvec"), F.col("cvec")), F.col("qnrm") * F.col("cnrm")).alias("cos"),
        )
        .distinct()  # a neighbor can reach the query through both probed cells
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w).cast("int")).filter(
        F.col("rank") <= k
    )


# one Lloyd round suffices on the fixture embeddings (recall@5 0.79 vs
# 0.76 at three rounds — extra rounds shrink cells around the first-k
# seeds); each round costs a full assign pass, so fewer is also faster
KMEANS_ITERS = 1
KM_NUM_CELLS = 16
KM_NUM_PROBES = 3


def kmeans_centroids(
    emb: DataFrame,
    num_cells: int = KM_NUM_CELLS,
    iters: int = KMEANS_ITERS,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    width: int | None = None,
) -> DataFrame:
    """Lloyd-refined IVF centroids, deterministic end to end: init = the
    first ``num_cells`` vectors by id (a fixed "seed"), then ``iters``
    rounds of cosine-assignment + element-wise mean. All JVM
    expressions — posexplode to (cell, dim) cells, avg per dim, rebuild
    the array ordered by dim. A cell that loses every member drops out
    (standard k-means degeneracy; fewer cells just means coarser
    probing).

    Scale note: each iteration is one broadcast-assign pass plus a
    (num_cells x dim)-row aggregate — at 100 TB, train on
    ``emb.sample(...)`` (a few million rows) and apply the final
    centroids to the full corpus; the assignment pass is the same
    either way."""
    centroids = _dense_index_small(emb, id_col, vec_col, num_cells, "cell_id")
    for _ in range(iters):
        assigned = ivf_assign(emb, centroids, n_probe=1, id_col=id_col,
                              vec_col=vec_col, width=width)
        # component means through the decimal discipline (exact,
        # order-independent sums; catalog.py rules) instead of plain
        # F.avg: makes the whole FIXED-ITERATION training loop
        # bit-reproducible in DuckDB, which is what lets
        # ann_ivf_kmeans_topk carry a real oracle
        from ..catalog import dsum

        # dsum: exact decimal mean on finite cells, IEEE NaN/Inf
        # propagation on poisoned ones (round-9 float-edge pin)
        mean_val = dsum(F.col("val").cast("double")) / F.count("*")
        centroids = (
            assigned.select("cell_id", F.posexplode("vec").alias("dim", "val"))
            .groupBy("cell_id", "dim")
            .agg(mean_val.alias("mean_val"))
            .groupBy("cell_id")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("dim", "mean_val"))),
                    lambda s: s.mean_val,
                ).alias(vec_col)
            )
            # materialize the (num_cells x dim)-sized table NOW: without
            # this, every later reference replays all prior iterations
            # (the classic iterative-lineage blowup)
            .localCheckpoint(eager=True)
        )
    return centroids


def ivf_kmeans_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = TOP_K,
    num_cells: int = KM_NUM_CELLS,
    n_probe: int = KM_NUM_PROBES,
    iters: int = KMEANS_ITERS,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    width: int | None = None,
) -> DataFrame:
    """IVF ANN over k-means-refined centroids. Same probe/rank plan as
    ``ivf_topk``; only the centroid table differs. Iterative training
    is not SQL-expressible, so this query is recall-tested against the
    brute-force baseline instead of a DuckDB oracle."""
    from ..functions.vectors import norm as vnorm

    centroids = kmeans_centroids(emb, num_cells, iters, id_col, vec_col, width)
    corpus_cells = ivf_assign(emb, centroids, n_probe=1, id_col=id_col,
                              vec_col=vec_col, width=width)
    query_cells = ivf_assign(
        queries, centroids, n_probe=n_probe, id_col=id_col, vec_col=vec_col,
        width=width,
    )
    q = query_cells.select(
        F.col("id").alias("query_id"), F.col("vec").alias("qvec"),
        vnorm(F.col("vec")).alias("qnrm"), "cell_id",
    )
    c = corpus_cells.select(
        F.col("id").alias("neighbor_id"), F.col("vec").alias("cvec"),
        vnorm(F.col("vec")).alias("cnrm"), "cell_id",
    )
    scored = (
        q.join(c, "cell_id")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.try_divide(dot(F.col("qvec"), F.col("cvec")), F.col("qnrm") * F.col("cnrm")).alias("cos"),
        )
        .distinct()
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w).cast("int")).filter(
        F.col("rank") <= k
    )


def numpy_topk_batch(
    emb: DataFrame,
    queries: DataFrame,
    k: int = TOP_K,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Throughput path: corpus is collected to a broadcast numpy matrix;
    each Arrow batch of queries does one matmul. Appropriate when the
    corpus (or an IVF cell of it) fits in executor memory; for larger
    corpora, shard the corpus and union per-shard top-k."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    spark = emb.sparkSession
    corpus = emb.select(id_col, vec_col).toPandas()
    ids = np.asarray(corpus[id_col].values)
    mat = np.vstack([np.asarray(v, dtype=np.float64) for v in corpus[vec_col]])
    mat_norm = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    b_ids = spark.sparkContext.broadcast(ids)
    b_mat = spark.sparkContext.broadcast(mat_norm)

    def _topk(cols):
        qid, qvec = cols
        out = []
        for one_id, vec in zip(qid, qvec):
            v = np.asarray(vec, dtype=np.float64)
            v = v / np.linalg.norm(v)
            cos = b_mat.value @ v
            mask = b_ids.value != one_id
            order = np.lexsort((b_ids.value[mask], -cos[mask]))[:k]
            sel_ids = b_ids.value[mask][order]
            sel_cos = cos[mask][order]
            out.append(
                {
                    "neighbor_ids": [int(x) for x in sel_ids],
                    "cosines": [float(x) for x in sel_cos],
                }
            )
        return pd.DataFrame(out, columns=["neighbor_ids", "cosines"])

    udf = pandas_udf(
        lambda a, b: _topk((a, b)),
        "neighbor_ids array<long>, cosines array<double>",
    )
    return (
        queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec"))
        .withColumn("nn", udf(F.col("query_id"), F.col("qvec")))
        .select(
            "query_id",
            F.posexplode(F.col("nn.neighbor_ids")).alias("pos", "neighbor_id"),
        )
        .select("query_id", (F.col("pos") + 1).cast("int").alias("rank"), "neighbor_id")
    )


def hard_negative_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = TOP_K,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    width: int | None = None,
) -> DataFrame:
    """Top-k nearest neighbors of each query that carry a DIFFERENT
    label — hard-negative mining for contrastive training (the
    highest-cosine wrong-class examples are the informative negatives;
    random negatives are too easy). Same shape as brute_force_topk with
    the label-mismatch predicate fused into the join filter (shared
    core: _pairwise_topk); at corpus scale the candidate set comes from
    the IVF/LSH index instead of the full corpus and this exact ranking
    runs over candidates only. Ties broken by neighbor id — fully
    deterministic."""
    return _pairwise_topk(
        emb, queries, k, id_col, vec_col, width, "negative_id", label_col
    )
