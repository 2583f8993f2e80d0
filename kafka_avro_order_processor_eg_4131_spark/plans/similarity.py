"""Similarity-search queries over ``embeddings`` (north-star extension;
operators in operators/similarity.py). Query set = vec_id < 20 keeps
the fixture-scale join bounded while exercising the full ranking path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import bigcount_sql, dsum, dsum_sql, is_finite, load, register
from ..functions.vectors import cosine_sql, dot_sql, valid_vec, valid_vec_sql
from ..operators import cache as C
from ..operators import similarity as S

_N_QUERIES = 20

_COS = cosine_sql("q.embedding", "c.embedding")


def _vemb(sql: str) -> str:
    """Route an oracle through the VALID-vector relation (round-9
    vector-shape pin): every ``embeddings`` table reference becomes
    ``vemb`` — the rows satisfying functions.vectors.valid_vec_sql —
    mirroring the Spark side's valid_vec filter in _build_emb.
    Malformed vectors (NULL / empty / wrong-dim / NULL-component) are
    excluded from the whole ANN family like NULL keys, identically in
    both engines, instead of NULL-padding a fold here and crashing an
    Arrow kernel there.

    IDEMPOTENT (round-9 advice): a composed eval oracle embeds
    already-wrapped component oracles as parenthesized derived tables,
    each carrying its own scoped ``vemb`` CTE. Rewrapping would
    textually rewrite those inner definitions into self-referential
    ``vemb AS (SELECT * FROM vemb ...)`` forms that only work because
    DuckDB resolves the name to the outer scope — so a body that
    already contains a vemb definition is returned unchanged, after
    asserting every raw ``embeddings`` reference in it sits inside one
    of those inner definitions (fail loudly if a future composed oracle
    adds a direct scan that would dodge the fence)."""
    if "vemb AS (" in sql:
        n_defs = sql.count("vemb AS (SELECT * FROM embeddings")
        # explicit raise, not assert: the fence must survive `python -O`
        # (round-10 advice — an optimized run would compile the assert
        # out and let an unfenced scan through unchecked)
        if sql.count("FROM embeddings") != n_defs or "JOIN embeddings" in sql:
            raise ValueError(
                "_vemb: composed oracle scans embeddings outside a vemb CTE"
            )
        return sql
    cte = (
        "vemb AS (SELECT * FROM embeddings WHERE "
        + valid_vec_sql("embedding")
        + ")"
    )
    body = sql.replace("FROM embeddings", "FROM vemb").replace(
        "JOIN embeddings", "JOIN vemb"
    )
    stripped = body.lstrip()
    if stripped.startswith("WITH"):
        return body.replace("WITH", f"WITH {cte},", 1)
    return f"WITH {cte}\n" + body

# Session-level cache of the embeddings relation, repartitioned to a
# width proportional to its actual row count (rows/250, capped at the
# cluster default — the connected_components adaptive-parts move): five
# queries in this family re-derive from the identical 2000-row table,
# and at fixture scale the default 64-way layout makes every stage
# task-scheduling overhead. At 100 TB the cap rules and this is exactly
# the default width. Owned by operators/cache.py's family registry.


def _build_emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    # shape-contract fence (round-9 vector-shape pin): malformed
    # vectors never enter the family cache — see _vemb's docstring
    e = load(spark, sf_dir, "embeddings").filter(valid_vec(F.col("embedding")))
    n = e.count()
    width = max(1, min(spark.sparkContext.defaultParallelism * 2, n // 250 + 1))
    return e.repartition(width)


def _emb_cached(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, int]:
    df = C.family(
        spark,
        "similarity.embeddings",
        sf_dir,
        lambda: _build_emb(spark, sf_dir),
        eager=True,  # every family member starts warm (A/B'd round 2)
    )
    # the cached relation's layout IS the adaptive width (repartitioned
    # before persist), so the width needs no side-channel
    return df, df.rdd.getNumPartitions()


@register(
    "ann_cosine_topk",
    oracle=_vemb(f"""
    WITH scored AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, {_COS} AS cos
      FROM embeddings q JOIN embeddings c ON q.vec_id <> c.vec_id
      WHERE q.vec_id < {_N_QUERIES}
    ),
    ranked AS (
      SELECT query_id, neighbor_id, cos,
             CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                                     ORDER BY cos DESC, neighbor_id) AS INT) AS rank
      FROM scored
    )
    SELECT query_id, neighbor_id, cos, rank FROM ranked WHERE rank <= {S.TOP_K}
    """),
)
def ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-5 per query vector — the brute-force baseline.
    Dot products are left-fold doubles (functions/vectors.py), so the
    scores are bit-identical to DuckDB's list_reduce fold."""
    return _brute_topk_cached(spark, sf_dir)


def _brute_topk_cached(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Family cache for the brute-force ground-truth top-k (tiny —
    N_QUERIES x k rows): consumed by the registered query, the LSH
    recall/MRR eval, and the fusion-gain ablation. Without it the
    full corpus scan re-runs per consumer (round-3 verdict)."""

    def build() -> DataFrame:
        e, width = _emb_cached(spark, sf_dir)
        queries = e.filter(F.col("vec_id") < _N_QUERIES)
        return S.brute_force_topk(e, queries, width=width)

    # eager (round 11, mechanism refined round 12): the catalog's
    # fused consumers (ann_eval_fusion_gain's 3-branch union, whose
    # rrf branch NESTS the lsh/ivf caches) do NOT populate these lazy
    # persists — every consumer was silently re-running the builder
    # (measured: lsh/rrf entries cost 1.8-2.5 s as "cache reads",
    # 0.25 s once actually cached). A SIMPLE broadcast consumer DOES
    # populate (pinned both ways in tests/test_round12_ops.py); the
    # skip is specific to the nested-cache/union shape. One count()
    # at build time fills the cache for everyone either way.
    return C.family(spark, "similarity.topk.brute", sf_dir, build, eager=True)


@register(
    "ann_ivf_topk",
    oracle=_vemb(f"""
    WITH centroids AS (
      SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS INT) AS cell_id,
             embedding
      FROM embeddings ORDER BY vec_id LIMIT {S.NUM_CELLS}
    ),
    affinities AS (
      SELECT e.vec_id AS id, e.embedding AS vec, c.cell_id,
             {cosine_sql("e.embedding", "c.embedding")} AS aff
      FROM embeddings e CROSS JOIN centroids c
    ),
    ranked_cells AS (
      SELECT id, vec, cell_id,
             ROW_NUMBER() OVER (PARTITION BY id ORDER BY aff DESC, cell_id) AS cell_rank
      FROM affinities
    ),
    corpus_cells AS (SELECT id, vec, cell_id FROM ranked_cells WHERE cell_rank <= 1),
    query_cells  AS (SELECT id, vec, cell_id FROM ranked_cells
                     WHERE cell_rank <= {S.NUM_PROBES} AND id < {_N_QUERIES}),
    scored AS (
      SELECT DISTINCT q.id AS query_id, c.id AS neighbor_id,
             {cosine_sql("q.vec", "c.vec")} AS cos
      FROM query_cells q JOIN corpus_cells c
        ON q.cell_id = c.cell_id AND q.id <> c.id
    ),
    ranked AS (
      SELECT query_id, neighbor_id, cos,
             CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                                     ORDER BY cos DESC, neighbor_id) AS INT) AS rank
      FROM scored
    )
    SELECT query_id, neighbor_id, cos, rank FROM ranked WHERE rank <= {S.TOP_K}
    """),
)
def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN: corpus indexed into nearest-centroid cells, queries probe
    their 2 nearest cells, exact ranking within the probed cells — the
    inverted-file scale path (candidates ~ corpus/num_cells * probes)."""
    return _ivf_topk_cached(spark, sf_dir)


def _ivf_topk_cached(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Family cache for the IVF top-k relation — consumed by the
    registered query, the RRF fusion, and the fusion-gain ablation."""

    def build() -> DataFrame:
        e, width = _emb_cached(spark, sf_dir)
        queries = e.filter(F.col("vec_id") < _N_QUERIES)
        return S.ivf_topk(e, queries, width=width)

    # eager (round 11, mechanism refined round 12): the catalog's
    # fused consumers (ann_eval_fusion_gain's 3-branch union, whose
    # rrf branch NESTS the lsh/ivf caches) do NOT populate these lazy
    # persists — every consumer was silently re-running the builder
    # (measured: lsh/rrf entries cost 1.8-2.5 s as "cache reads",
    # 0.25 s once actually cached). A SIMPLE broadcast consumer DOES
    # populate (pinned both ways in tests/test_round12_ops.py); the
    # skip is specific to the nested-cache/union shape. One count()
    # at build time fills the cache for everyone either way.
    return C.family(spark, "similarity.topk.ivf", sf_dir, build, eager=True)


@register(
    "ann_ivf_kmeans_topk",
    oracle=_vemb(f"""
    WITH c0 AS (
      SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS INT) AS cell_id,
             embedding
      FROM embeddings ORDER BY vec_id LIMIT {S.KM_NUM_CELLS}
    ),
    aff0 AS (
      SELECT e.vec_id AS id, e.embedding AS vec, c.cell_id,
             {cosine_sql("e.embedding", "c.embedding")} AS aff
      FROM embeddings e CROSS JOIN c0 c
    ),
    asg0 AS (
      SELECT id, vec, cell_id FROM (
        SELECT id, vec, cell_id,
               ROW_NUMBER() OVER (PARTITION BY id
                                  ORDER BY aff DESC, cell_id) AS r
        FROM aff0) WHERE r = 1
    ),
    comp AS (
      SELECT cell_id,
             unnest(list_transform(vec, x -> CAST(x AS DOUBLE))) AS v,
             unnest(generate_series(1, len(vec))) AS pos
      FROM asg0
    ),
    m AS (
      -- dsum discipline incl. round-9 IEEE propagation: a cell holding
      -- a NaN/Inf vector gets a NaN/Inf centroid component, and the
      -- downstream cosine folds propagate it identically in both
      -- engines (pure double math, deterministic tiebreaks)
      SELECT cell_id, pos, ({dsum_sql("v")} / COUNT(*)) AS mv
      FROM comp GROUP BY cell_id, pos
    ),
    c1 AS (
      SELECT cell_id, list(mv ORDER BY pos) AS embedding FROM m GROUP BY cell_id
    ),
    aff1 AS (
      SELECT e.vec_id AS id, e.embedding AS vec, c.cell_id,
             {cosine_sql("e.embedding", "c.embedding")} AS aff,
             ROW_NUMBER() OVER (PARTITION BY e.vec_id
                                ORDER BY {cosine_sql("e.embedding", "c.embedding")}
                                         DESC, c.cell_id) AS r
      FROM embeddings e CROSS JOIN c1 c
    ),
    corpus_cells AS (SELECT id, vec, cell_id FROM aff1 WHERE r <= 1),
    query_cells  AS (SELECT id, vec, cell_id FROM aff1
                     WHERE r <= {S.KM_NUM_PROBES} AND id < {_N_QUERIES}),
    scored AS (
      SELECT DISTINCT q.id AS query_id, c.id AS neighbor_id,
             {cosine_sql("q.vec", "c.vec")} AS cos
      FROM query_cells q JOIN corpus_cells c
        ON q.cell_id = c.cell_id AND q.id <> c.id
    ),
    ranked AS (
      SELECT query_id, neighbor_id, cos,
             CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                                     ORDER BY cos DESC, neighbor_id) AS INT) AS rank
      FROM scored
    )
    SELECT query_id, neighbor_id, cos, rank FROM ranked WHERE rank <= {S.TOP_K}
    """),
)
def ann_ivf_kmeans_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN with Lloyd-refined centroids (16 cells, 1 iteration,
    3 probes, deterministic first-k seed) — finer, better-balanced
    cells than ann_ivf_topk's 8 first-k centroids: recall@5 ~0.79 vs
    ~0.64 while scanning FEWER candidates (~93 vs ~127 of 500).
    Round 2: the FIXED one-round Lloyd training loop-unrolls into SQL
    exactly like PageRank's fixed iterations — the component means ride
    the decimal discipline (operators/similarity.py::kmeans_centroids),
    the cosine folds are the usual left-folds, so the whole
    train->assign->probe->rank pipeline is hash-checked by DuckDB.
    Recall additionally pinned against brute force in
    tests/test_extensions.py."""
    assert S.KMEANS_ITERS == 1, "oracle unrolls exactly one Lloyd round"
    e, width = _emb_cached(spark, sf_dir)
    queries = e.filter(F.col("vec_id") < _N_QUERIES)
    return S.ivf_kmeans_topk(e, queries, width=width)


@register(
    "ann_lsh_topk",
    oracle=_vemb(f"""
    WITH lead AS (
      SELECT embedding,
             CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS BIGINT) AS rn
      FROM embeddings ORDER BY vec_id
      LIMIT {2 * S.NUM_TABLES * S.BITS_PER_TABLE}
    ),
    planes AS (
      SELECT CAST((a.rn // 2) // {S.BITS_PER_TABLE} AS INT) AS table_id,
             CAST((a.rn // 2) % {S.BITS_PER_TABLE} AS INT) AS bit_id,
             a.embedding AS p1, b.embedding AS p2
      FROM lead a JOIN lead b ON b.rn = a.rn + 1
      WHERE a.rn % 2 = 0
    ),
    bucketed AS (
      SELECT e.vec_id AS id, e.embedding AS vec, p.table_id,
             CAST(SUM(CASE WHEN {dot_sql("e.embedding", "p.p1")}
                             - {dot_sql("e.embedding", "p.p2")} >= 0
                      THEN CAST(POW(2.0, p.bit_id) AS BIGINT) ELSE 0 END) AS BIGINT)
               AS bucket
      FROM embeddings e CROSS JOIN planes p
      GROUP BY e.vec_id, e.embedding, p.table_id
    ),
    scored AS (
      SELECT DISTINCT q.id AS query_id, c.id AS neighbor_id,
             {cosine_sql("q.vec", "c.vec")} AS cos
      FROM bucketed q JOIN bucketed c
        ON q.table_id = c.table_id AND q.bucket = c.bucket AND q.id <> c.id
      WHERE q.id < {_N_QUERIES}
    ),
    ranked AS (
      SELECT query_id, neighbor_id, cos,
             CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                                     ORDER BY cos DESC, neighbor_id) AS INT) AS rank
      FROM scored
    )
    SELECT query_id, neighbor_id, cos, rank FROM ranked WHERE rank <= {S.TOP_K}
    """),
)
def ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-5 via multi-table sign-LSH (4 tables x 4 bits,
    difference-pair hyperplanes): candidates are bucket collisions in
    any table — the scale path replacing the quadratic cross join.
    Recall@5 ~0.5 on the fixture embeddings vs ~0.01 for a single
    8-bit table (pinned in tests/test_extensions.py)."""
    return _lsh_topk_cached(spark, sf_dir)


def _lsh_topk_cached(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Family cache for the LSH top-k relation. Also what silenced the
    round-3 `Asked to cache already cached data` warning: the fusion
    ablation used to build lsh_topk twice in one plan (directly and via
    ann_rrf_fusion), persisting the identical ephemeral bucketed
    relation twice; with the result family-cached the builder — and its
    internal ephemeral — runs once per session."""

    def build() -> DataFrame:
        e, width = _emb_cached(spark, sf_dir)
        queries = e.filter(F.col("vec_id") < _N_QUERIES)
        return S.lsh_topk(e, queries, width=width)

    # eager (round 11, mechanism refined round 12): the catalog's
    # fused consumers (ann_eval_fusion_gain's 3-branch union, whose
    # rrf branch NESTS the lsh/ivf caches) do NOT populate these lazy
    # persists — every consumer was silently re-running the builder
    # (measured: lsh/rrf entries cost 1.8-2.5 s as "cache reads",
    # 0.25 s once actually cached). A SIMPLE broadcast consumer DOES
    # populate (pinned both ways in tests/test_round12_ops.py); the
    # skip is specific to the nested-cache/union shape. One count()
    # at build time fills the cache for everyone either way.
    return C.family(spark, "similarity.topk.lsh", sf_dir, build, eager=True)


@register(
    "embedding_centroid_by_label",
    oracle=_vemb(f"""
    WITH u AS (
      SELECT label,
             unnest(list_transform(embedding, x -> CAST(x AS DOUBLE))) AS v,
             unnest(generate_series(1, len(embedding))) AS pos
      FROM embeddings
    ), s AS (
      SELECT label, pos,
             SUM(CAST(CASE WHEN isfinite(v) THEN v END AS DECIMAL(30,6))) AS s,
             COUNT(CASE WHEN NOT isfinite(v) THEN 1 END) AS q_nf,
             COUNT(*) AS n
      FROM u GROUP BY label, pos
    ), m AS (
      -- a (label, dim) cell touched by any NaN/Inf component has no
      -- representable e9 fixed-point mean: pinned to the 'nf' token on
      -- both sides (round-9 float-edge probe)
      SELECT label, pos,
             CASE WHEN q_nf > 0 THEN NULL
                  ELSE CAST(sign(s) AS BIGINT)
                       * ((2 * abs(CAST(s * 1000000 AS BIGINT)) * 1000 + n)
                          // (2 * n)) END AS mv_e9
      FROM s
    ), cent AS (
      SELECT label,
             array_to_string(list_transform(list(mv_e9 ORDER BY pos),
                                            x -> COALESCE(CAST(x AS VARCHAR),
                                                          'nf')), ',')
               AS centroid_e9
      FROM m GROUP BY label
    ), n AS (
      SELECT label, {bigcount_sql()} AS n_vectors FROM embeddings GROUP BY label
    )
    SELECT cent.label, cent.centroid_e9, n.n_vectors
    FROM cent JOIN n ON n.label = cent.label
    """),
)
def embedding_centroid_by_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed vector mean per class label — the centroid-update
    kernel of k-means / class-prototype computation. posexplode turns
    the array column into (label, dim, value) rows so the mean is an
    ordinary two-key aggregate with map-side partial sums — each
    component sum is decimal-exact (order-independent, catalog.py
    discipline) — then the per-dim means reassemble into an ordered
    CSV via sort-by-position. The mean is emitted as a FIXED-POINT e9
    integer (half-up-rounded mean*1e9) computed with pure BIGINT
    arithmetic on both sides: printf of the mean double is NOT
    portable here, because scale-6 sums divided by small counts land
    on exact decimal ties (probability ~1/n per component) where Java
    HALF_UP and C printf disagree. sign*( (2*|s*1e9| + n) DIV (2n) )
    is bit-exact in any engine. (BIGINT headroom: |sum|*1e9*2 must fit
    63 bits — fine for unit-norm embeddings up to ~4e9 rows per
    (label,dim); beyond that, widen to DECIMAL(38,0).) At 100 TB this
    is one explode (x dim) + one shuffle on (label, dim): no
    driver-side vectors, no UDF, and dimension parallelism means even
    a single giant label distributes across dim-many tasks."""
    e = load(spark, sf_dir, "embeddings").filter(valid_vec(F.col("embedding")))
    vd = F.col("v").cast("double")
    u = e.select("label", F.posexplode(F.col("embedding")).alias("pos", "v"))
    m = u.groupBy("label", "pos").agg(
        F.sum(F.when(is_finite(vd), vd).cast("decimal(30,6)")).alias("s"),
        F.count(F.when(~is_finite(vd), F.lit(1))).alias("q_nf"),
        F.count("*").alias("n"),
    ).select(
        "label",
        "pos",
        # mirrors the oracle: any non-finite component -> NULL -> 'nf'
        F.when(
            F.col("q_nf") == 0,
            F.expr(
                "CAST(sign(s) AS BIGINT)"
                " * ((2 * abs(CAST(s * 1000000 AS BIGINT)) * 1000 + n)"
                " DIV (2 * n))"
            ),
        ).alias("mv_e9"),
    )
    cent = m.groupBy("label").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "mv_e9"))),
                lambda s: F.coalesce(s.mv_e9.cast("string"), F.lit("nf")),
            ),
            ",",
        ).alias("centroid_e9")
    )
    n = e.groupBy("label").agg(F.count("*").alias("n_vectors"))
    return cent.join(n, "label").select("label", "centroid_e9", "n_vectors")


@register(
    "embedding_quantize_int8",
    oracle=_vemb("""
    WITH amax AS (
      -- scale over FINITE components only (+0.0 normalizes a possible
      -- -0.0 max: DuckDB abs(-0.0) keeps the sign, Spark's does not);
      -- list_max skips the NULLed non-finite entries
      SELECT MAX(list_max(list_transform(embedding,
               x -> CASE WHEN isfinite(CAST(x AS DOUBLE))
                         THEN abs(CAST(x AS DOUBLE)) + 0.0 END))) AS a
      FROM embeddings
    )
    SELECT vec_id,
           a AS scale,
           -- non-finite components have no int8 image: pinned 'nf'
           -- token; a zero/NULL scale also yields 'nf' (x/0 is NULL in
           -- DuckDB, try_divide NULL in Spark)
           array_to_string(list_transform(embedding,
             x -> CASE WHEN isfinite(CAST(x AS DOUBLE))
                       THEN COALESCE(CAST(CAST(floor(CAST(x AS DOUBLE) / nullif(a, 0.0)
                                                     * 127.0 + 0.5) AS INT)
                                          AS VARCHAR), 'nf')
                       ELSE 'nf' END), ',')
             AS qvec
    FROM embeddings CROSS JOIN amax
    """),
)
def embedding_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 quantization of the embedding column — the 4x
    storage/bandwidth reduction an ANN serving layer applies before
    indexing. One pass finds the corpus max-abs (a 1-row broadcast),
    one projection maps every component to round(v/amax*127), written
    as floor(x+0.5) because THAT is bit-identical across engines
    (round()'s half-case tie rule is not guaranteed portable). Per-row
    array transform, no shuffle beyond the scalar broadcast."""
    e, _ = _emb_cached(spark, sf_dir)
    fin_abs = lambda x: F.when(  # noqa: E731
        is_finite(x.cast("double")), F.abs(x.cast("double")) + F.lit(0.0)
    )
    amax = e.agg(F.max(F.array_max(F.transform(F.col("embedding"), fin_abs))).alias("a"))
    q = F.array_join(
        F.transform(
            F.col("embedding"),
            lambda x: F.when(
                is_finite(x.cast("double")),
                F.coalesce(
                    F.floor(
                        F.try_divide(x.cast("double"), F.nullif(F.col("a"), F.lit(0.0)))
                        * 127.0
                        + 0.5
                    )
                    .cast("int")
                    .cast("string"),
                    F.lit("nf"),
                ),
            ).otherwise(F.lit("nf")),
        ),
        ",",
    )
    return (
        e.crossJoin(F.broadcast(amax))
        .select("vec_id", F.col("a").alias("scale"), q.alias("qvec"))
    )


_Q8 = (
    # non-finite components quantize to NULL; a NULL poisons the
    # integer dot via list_reduce/aggregate NULL propagation (round-9)
    "list_transform(embedding, "
    "x -> CASE WHEN isfinite(CAST(x AS DOUBLE)) THEN "
    "CAST(floor(CAST(x AS DOUBLE) / nullif(a, 0.0) * 127.0 + 0.5) AS BIGINT) "
    "END)"
)


@register(
    "ann_int8_dot_topk",
    oracle=_vemb(f"""
    WITH amax AS (
      SELECT MAX(list_max(list_transform(embedding,
               x -> CASE WHEN isfinite(CAST(x AS DOUBLE))
                         THEN abs(CAST(x AS DOUBLE)) + 0.0 END))) AS a
      FROM embeddings
    ), q8 AS (
      SELECT vec_id, {_Q8} AS qv
      FROM embeddings CROSS JOIN amax
    ), scored AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             CAST(list_reduce(list_transform(list_zip(q.qv, c.qv),
                    x -> x[1] * x[2]), (acc, v) -> acc + v) AS BIGINT) AS idot
      FROM q8 q JOIN q8 c ON q.vec_id <> c.vec_id
      WHERE q.vec_id < {_N_QUERIES}
    ), ranked AS (
      SELECT query_id, neighbor_id, idot,
             CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                                     ORDER BY idot DESC NULLS LAST, neighbor_id)
                  AS INT) AS rank
      FROM scored
    )
    SELECT query_id, neighbor_id, idot, rank FROM ranked WHERE rank <= {S.TOP_K}
    """),
)
def ann_int8_dot_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantized ANN serving path: top-5 neighbors ranked by the INTEGER
    dot product of symmetric-int8 quantized vectors (the
    embedding_quantize_int8 scheme) — the 4x-bandwidth rerank an ANN
    index performs over its candidate set before optional full-precision
    rescoring. Integer products summed as BIGINTs are exactly
    order-independent, so unlike the float cosine queries this ranking
    needs NO left-fold/decimal discipline — quantization is what buys
    bit-exact distributed scoring. Fixture-scale uses the all-pairs
    candidate set so the oracle is total; at 100 TB the same scorer
    runs over LSH/IVF candidate pairs (ann_lsh_topk / ann_ivf_topk
    shapes). Per-query ranking windows partition by query_id."""
    from pyspark.sql import Window

    e, width = _emb_cached(spark, sf_dir)
    fin_abs = lambda x: F.when(  # noqa: E731 — finite-only scale, -0.0 normalized
        is_finite(x.cast("double")), F.abs(x.cast("double")) + F.lit(0.0)
    )
    amax = e.agg(F.max(F.array_max(F.transform(F.col("embedding"), fin_abs))).alias("a"))
    q8 = e.crossJoin(F.broadcast(amax)).select(
        "vec_id",
        F.transform(
            F.col("embedding"),
            # non-finite -> NULL component; NULL poisons the fold below
            lambda x: F.when(
                is_finite(x.cast("double")),
                F.floor(
                    F.try_divide(x.cast("double"), F.nullif(F.col("a"), F.lit(0.0)))
                    * 127.0
                    + 0.5
                ).cast("bigint"),
            ),
        ).alias("qv"),
    )
    q = q8.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("qv").alias("qq")
    )
    c = q8.select(F.col("vec_id").alias("neighbor_id"), F.col("qv").alias("cq"))
    idot = F.aggregate(
        F.zip_with(F.col("qq"), F.col("cq"), lambda a, b: a * b),
        F.lit(0).cast("bigint"),
        lambda acc, v: acc + v,
    )
    scored = (
        q.join(c, F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", idot.cast("bigint").alias("idot"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("idot").desc_nulls_last(), F.col("neighbor_id")
    )
    return scored.withColumn("rank", F.row_number().over(w).cast("int")).filter(
        F.col("rank") <= S.TOP_K
    )


# --- MMR diversified re-ranking ---------------------------------------------

_MMR_K = 5        # final diversified picks
_MMR_N = 10       # relevance candidate pool
_MMR_QID = 0      # query vector
_MMR_LAM = "CAST(0.7 AS DOUBLE)"
_MMR_ONE_MINUS = "CAST(0.3 AS DOUBLE)"


def _mmr_oracle() -> str:
    """Loop-unrolled greedy MMR: K fixed selection steps, each a
    one-row argmax CTE over the shrinking candidate pool (same
    fixed-iteration unrolling as the PageRank / Lloyd oracles)."""
    head = f"""
    WITH qv AS (
      SELECT embedding AS qv FROM embeddings WHERE vec_id = {_MMR_QID}
    ),
    cands AS (
      SELECT e.vec_id AS id, e.embedding AS vec,
             {cosine_sql("qv.qv", "e.embedding")} AS rel
      FROM embeddings e CROSS JOIN qv
      WHERE e.vec_id <> {_MMR_QID}
      ORDER BY rel DESC, id LIMIT {_MMR_N}
    ),
    pairs AS (
      SELECT a.id AS a_id, b.id AS b_id, {cosine_sql("a.vec", "b.vec")} AS sim
      FROM cands a JOIN cands b ON a.id <> b.id
    ),
    sel1 AS (
      SELECT CAST(1 AS INTEGER) AS step, id, rel,
             {_MMR_LAM} * rel AS mmr_score
      FROM cands ORDER BY rel DESC, id LIMIT 1
    ),
    selu1 AS (SELECT step, id, rel, mmr_score FROM sel1)"""
    steps = []
    for k in range(2, _MMR_K + 1):
        steps.append(f""",
    sel{k} AS (
      SELECT CAST({k} AS INTEGER) AS step, c.id, c.rel,
             {_MMR_LAM} * c.rel - {_MMR_ONE_MINUS} * MAX(p.sim) AS mmr_score
      FROM cands c
      JOIN pairs p ON p.a_id = c.id
                  AND p.b_id IN (SELECT id FROM selu{k - 1})
      WHERE c.id NOT IN (SELECT id FROM selu{k - 1})
      GROUP BY c.id, c.rel
      ORDER BY mmr_score DESC, c.id LIMIT 1
    ),
    selu{k} AS (SELECT * FROM selu{k - 1} UNION ALL SELECT * FROM sel{k})""")
    tail = f"""
    SELECT step, id AS neighbor_id, rel, mmr_score
    FROM selu{_MMR_K} ORDER BY step
    """
    return head + "".join(steps) + tail


@register("ann_mmr_diversified", oracle=_vemb(_mmr_oracle()))
def ann_mmr_diversified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal-marginal-relevance re-ranking: after the (distributed)
    exact top-10 relevance scan for the query vector, greedily select 5
    results maximizing lambda*rel - (1-lambda)*max-sim-to-already-picked
    (lambda=0.7) — the diversification pass a retrieval/RAG serving
    layer runs so near-duplicate neighbors don't crowd the result list.
    Shape at scale: relevance scoring + top-N is the distributed part
    (brute force here; LSH/IVF candidate generation at 100 TB); the
    greedy loop then runs over the FIXED-size 10-row candidate pool —
    K=5 unrolled argmax steps, each a TakeOrdered(1) over <=10 rows, so
    the iterative part never touches more than N rows regardless of
    corpus size (no collect — the loop composes lazy plans). All
    scores are left-fold cosines and per-row double arithmetic,
    bit-identical in both engines; ties break on neighbor_id."""
    from ..functions.vectors import cosine

    lam, one_minus = F.lit(0.7), F.lit(0.3)
    e, _ = _emb_cached(spark, sf_dir)
    qv = e.filter(F.col("vec_id") == _MMR_QID).select(
        F.col("embedding").alias("qv")
    )
    cands = (
        e.filter(F.col("vec_id") != _MMR_QID)
        .crossJoin(F.broadcast(qv))
        .select(
            F.col("vec_id").alias("id"),
            F.col("embedding").alias("vec"),
            cosine(F.col("qv"), F.col("embedding")).alias("rel"),
        )
        .orderBy(F.col("rel").desc(), "id")
        .limit(_MMR_N)
    )
    cands = C.ephemeral(cands)
    # eager-materialize: the K unrolled selection branches all re-read
    # cands/pairs; a lazy persist would let the (corpus-wide) relevance
    # scan re-run once per branch before the cache fills
    cands.count()
    a = cands.select(F.col("id").alias("a_id"), F.col("vec").alias("a_vec"))
    b = cands.select(F.col("id").alias("b_id"), F.col("vec").alias("b_vec"))
    pairs = C.ephemeral(
        a.join(b, F.col("a_id") != F.col("b_id"))
        .select("a_id", "b_id", cosine(F.col("a_vec"), F.col("b_vec")).alias("sim"))
    )
    pairs.count()
    picked = (
        cands.orderBy(F.col("rel").desc(), "id")
        .limit(1)
        .select(
            F.lit(1).cast("int").alias("step"),
            "id",
            "rel",
            (lam * F.col("rel")).alias("mmr_score"),
        )
    )
    for step in range(2, _MMR_K + 1):
        sel_ids = picked.select("id")
        pen = (
            pairs.join(sel_ids.withColumnRenamed("id", "b_id"), "b_id")
            .groupBy("a_id")
            .agg(F.max("sim").alias("pen"))
        )
        pick = (
            cands.join(sel_ids, "id", "left_anti")
            .join(pen, F.col("id") == F.col("a_id"))
            .select(
                F.lit(step).cast("int").alias("step"),
                "id",
                "rel",
                (lam * F.col("rel") - one_minus * F.col("pen")).alias("mmr_score"),
            )
            .orderBy(F.col("mmr_score").desc(), "id")
            .limit(1)
        )
        # truncate lineage per pick: without this, step k re-executes all
        # k-1 previous TakeOrdered chains (the accumulated union feeds the
        # anti-join), turning the K-step loop into O(K^2) stage re-runs.
        # A localCheckpoint of a 1-row relation is one trivial job.
        picked = picked.unionByName(pick).localCheckpoint()
    return picked.select(
        "step", F.col("id").alias("neighbor_id"), "rel", "mmr_score"
    ).orderBy("step")


@register(
    "ann_hard_negatives",
    oracle=_vemb(f"""
    WITH scored AS (
      SELECT q.vec_id AS query_id, q.label AS query_label,
             c.vec_id AS negative_id, c.label AS negative_label,
             {_COS} AS cos
      FROM embeddings q JOIN embeddings c ON q.label <> c.label
      WHERE q.vec_id < {_N_QUERIES}
    ),
    ranked AS (
      SELECT query_id, query_label, negative_id, negative_label, cos,
             CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                                     ORDER BY cos DESC, negative_id) AS INT) AS rank
      FROM scored
    )
    SELECT query_id, query_label, negative_id, negative_label, cos, rank
    FROM ranked WHERE rank <= 3
    """),
)
def ann_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining for contrastive training: per query vector,
    the top-3 highest-cosine neighbors whose label DIFFERS (the
    informative negatives; sample_negative_pairs supplies the random
    easy ones). Exact over the fixture corpus — the label-mismatch
    theta join broadcasts the tiny query side and the corpus side
    carries the parallelism; at 100 TB the candidate set comes from the
    IVF/LSH index (operators/similarity.py) and only this last exact
    ranking runs per candidate list. Left-fold dot products keep scores
    bit-identical to DuckDB."""
    e, width = _emb_cached(spark, sf_dir)
    queries = e.filter(F.col("vec_id") < _N_QUERIES)
    return S.hard_negative_topk(e, queries, k=3, width=width)


# Retrieval-quality evaluation: the ground-truth (brute-force) and
# approximate (LSH) oracles are reused verbatim as derived tables —
# DuckDB allows a full WITH...SELECT inside parentheses — so this
# oracle stays textually in sync with the two it evaluates.
from ..catalog import REGISTRY as _REG


@register(
    "ann_eval_lsh_recall_mrr",
    oracle=_vemb(f"""
    WITH gt AS (SELECT * FROM ({_REG["ann_cosine_topk"].oracle})),
    ap AS (SELECT * FROM ({_REG["ann_lsh_topk"].oracle})),
    hits AS (
      SELECT g.query_id, g.neighbor_id, a.rank AS ap_rank
      FROM gt g LEFT JOIN ap a
        ON a.query_id = g.query_id AND a.neighbor_id = g.neighbor_id
    )
    SELECT query_id,
           CAST(COUNT(ap_rank) AS BIGINT) AS n_hits,
           CAST(COUNT(ap_rank) AS DOUBLE) / {S.TOP_K}.0 AS recall_at_k,
           CAST(MIN(ap_rank) AS INT) AS first_hit_rank,
           CASE WHEN MIN(ap_rank) IS NULL THEN 0.0
                ELSE 1.0 / MIN(ap_rank) END AS reciprocal_rank
    FROM hits GROUP BY query_id ORDER BY query_id
    """),
)
def ann_eval_lsh_recall_mrr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retrieval-quality evaluation of the LSH index against exact
    brute-force ground truth: per query, recall@k (fraction of the true
    top-k the index returned anywhere in its top-k) and the reciprocal
    rank of the first true hit (the MRR summand). This is the metric
    loop every ANN deployment runs before trading recall for speed;
    both inputs come from the already-registered oracle-checked plans
    (and the shared embeddings cache), so the whole evaluation is one
    left join + a per-query aggregate. recall is an exact small-integer
    ratio; 1/rank is a single correctly-rounded IEEE divide."""
    gt = ann_cosine_topk(spark, sf_dir).select(
        "query_id", "neighbor_id"
    )
    ap = ann_lsh_topk(spark, sf_dir).select(
        "query_id", "neighbor_id", F.col("rank").alias("ap_rank")
    )
    hits = gt.join(ap, ["query_id", "neighbor_id"], "left")
    return (
        hits.groupBy("query_id")
        .agg(
            F.count("ap_rank").alias("n_hits"),
            (F.count("ap_rank").cast("double") / float(S.TOP_K)).alias("recall_at_k"),
            F.min("ap_rank").cast("int").alias("first_hit_rank"),
            F.when(F.min("ap_rank").isNull(), F.lit(0.0))
            .otherwise(F.lit(1.0) / F.min("ap_rank"))
            .alias("reciprocal_rank"),
        )
        .orderBy("query_id")
    )


_KNN_EVAL_MOD = 20  # evaluate every 20th vector (leave-one-out queries)


@register(
    "eval_knn_label_accuracy",
    oracle=_vemb(f"""
    WITH scored AS (
      SELECT q.vec_id AS query_id, q.label AS true_label,
             c.label AS neigh_label, c.vec_id AS neighbor_id, {_COS} AS cos
      FROM embeddings q JOIN embeddings c ON q.vec_id <> c.vec_id
      WHERE q.vec_id % {_KNN_EVAL_MOD} = 0
    ),
    topk AS (
      SELECT query_id, true_label, neigh_label FROM (
        SELECT query_id, true_label, neigh_label,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY cos DESC, neighbor_id) AS rank
        FROM scored
      ) WHERE rank <= {S.TOP_K}
    ),
    votes AS (
      SELECT query_id, true_label, neigh_label, COUNT(*) AS v
      FROM topk GROUP BY query_id, true_label, neigh_label
    ),
    pred AS (
      SELECT query_id, true_label, neigh_label AS pred_label FROM (
        SELECT query_id, true_label, neigh_label,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY v DESC, neigh_label) AS r
        FROM votes
      ) WHERE r = 1
    )
    SELECT true_label,
           {bigcount_sql()} AS n_eval,
           CAST(SUM(CASE WHEN pred_label = true_label THEN 1 ELSE 0 END)
                AS BIGINT) AS n_correct,
           CAST(SUM(CASE WHEN pred_label = true_label THEN 1 ELSE 0 END)
                AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS accuracy
    FROM pred GROUP BY true_label ORDER BY true_label
    """),
)
def eval_knn_label_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-one-out k-NN classifier accuracy per label — the standard
    embedding-space health check (if 5-NN majority vote can't recover
    the label, the embedding isn't separating classes, and neither
    ANN-served retrieval nor near-dup thresholds can be trusted). A
    deterministic majority vote: top-5 by (cos desc, neighbor_id),
    vote argmax ties broken by smaller label. Every 20th vector is a
    query, self excluded by the brute core's id-mismatch filter; at
    corpus scale the candidate lists come from the IVF/LSH index.
    Counts are exact integers; accuracy is one IEEE divide."""
    from pyspark.sql import Window

    e, width = _emb_cached(spark, sf_dir)
    queries = e.filter(F.col("vec_id") % _KNN_EVAL_MOD == 0)
    topk = S.brute_force_topk(e, queries, width=width).select(
        "query_id", "neighbor_id"
    )
    qlab = e.select(F.col("vec_id").alias("query_id"), F.col("label").alias("true_label"))
    nlab = e.select(F.col("vec_id").alias("neighbor_id"), F.col("label").alias("neigh_label"))
    votes = (
        topk.join(nlab, "neighbor_id")
        .join(qlab, "query_id")
        .groupBy("query_id", "true_label", "neigh_label")
        .agg(F.count("*").alias("v"))
    )
    wv = Window.partitionBy("query_id").orderBy(F.col("v").desc(), "neigh_label")
    pred = (
        votes.withColumn("r", F.row_number().over(wv))
        .filter(F.col("r") == 1)
        .select("query_id", "true_label", F.col("neigh_label").alias("pred_label"))
    )
    correct = F.sum(
        F.when(F.col("pred_label") == F.col("true_label"), 1).otherwise(0)
    )
    return (
        pred.groupBy("true_label")
        .agg(
            F.count("*").alias("n_eval"),
            correct.alias("n_correct"),
            (correct.cast("double") / F.count("*").cast("double")).alias(
                "accuracy"
            ),
        )
        .orderBy("true_label")
    )


# --- retrieval fusion --------------------------------------------------------

_RRF_K = 60


def _rrf_oracle() -> str:
    from ..catalog import REGISTRY as _R

    return f"""
    WITH lsh AS ({_R["ann_lsh_topk"].oracle}),
    ivf AS ({_R["ann_ivf_topk"].oracle}),
    fused AS (
      SELECT COALESCE(l.query_id, i.query_id) AS query_id,
             COALESCE(l.neighbor_id, i.neighbor_id) AS neighbor_id,
             (CASE WHEN l.rank IS NOT NULL
                   THEN 1.0 / ({_RRF_K} + l.rank) ELSE 0.0 END
              + CASE WHEN i.rank IS NOT NULL
                     THEN 1.0 / ({_RRF_K} + i.rank) ELSE 0.0 END) AS rrf
      FROM lsh l FULL OUTER JOIN ivf i
        ON l.query_id = i.query_id AND l.neighbor_id = i.neighbor_id
    )
    SELECT query_id, neighbor_id, rrf, rank FROM (
      SELECT query_id, neighbor_id, rrf,
             CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                                     ORDER BY rrf DESC, neighbor_id) AS INT)
               AS rank
      FROM fused
    ) WHERE rank <= {S.TOP_K}
    """


@register("ann_rrf_fusion", oracle=_vemb(_rrf_oracle()))
def ann_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal-rank fusion of the two approximate retrievers (sign-
    LSH and IVF): rrf(d) = sum over lists containing d of
    1/(60 + rank_list(d)) — the standard score-free way to combine
    retrievers with incomparable similarity scales, and the multi-index
    recall amplifier a production vector store runs (each index misses
    different true neighbors; the union re-ranks cheaply). A full-outer
    equi-join of two top-k lists (query-bounded, tiny) and one per-query
    window — nothing corpus-scaled beyond the component retrievers
    themselves. The two reciprocal terms add in a FIXED textual order,
    so the score is bit-portable; the oracle composes the component
    oracles verbatim as CTEs (the corpus_dedup_rate pattern: composed
    definitions cannot drift from the checked ones)."""
    return _rrf_fusion_cached(spark, sf_dir)


def _rrf_fusion_cached(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Family cache for the fused top-k relation (tiny — at most
    N_QUERIES x k rows): consumed by the registered query AND the
    fusion-gain ablation, which used to re-run the full-outer join +
    window per consumer (round-10 verdict item 1c)."""

    def build() -> DataFrame:
        # round 12 (guide §2.6): when rrf is the FIRST topk toucher the
        # lsh and ivf eager builds are independent — warm them on two
        # concurrent threads instead of paying them back-to-back. The
        # spawn is skipped when both families are already registered
        # (the common bench path: fusion_gain's warm call filled them)
        # so the warm costs zero thread churn when there is nothing to
        # warm (round-12 advice).
        if not (
            C.is_cached(spark, "similarity.topk.lsh", sf_dir)
            and C.is_cached(spark, "similarity.topk.ivf", sf_dir)
        ):
            C.warm_concurrently(
                [
                    lambda: _lsh_topk_cached(spark, sf_dir),
                    lambda: _ivf_topk_cached(spark, sf_dir),
                ]
            )
        lsh = _lsh_topk_cached(spark, sf_dir).select(
            "query_id", "neighbor_id", F.col("rank").alias("r1")
        )
        ivf = _ivf_topk_cached(spark, sf_dir).select(
            "query_id", "neighbor_id", F.col("rank").alias("r2")
        )
        fused = lsh.join(
            ivf, ["query_id", "neighbor_id"], "full_outer"
        ).select(
            "query_id",
            "neighbor_id",
            (
                F.when(
                    F.col("r1").isNotNull(),
                    F.lit(1.0) / (_RRF_K + F.col("r1")),
                ).otherwise(F.lit(0.0))
                + F.when(
                    F.col("r2").isNotNull(),
                    F.lit(1.0) / (_RRF_K + F.col("r2")),
                ).otherwise(F.lit(0.0))
            ).alias("rrf"),
        )
        from pyspark.sql import Window as W

        w = W.partitionBy("query_id").orderBy(
            F.col("rrf").desc(), "neighbor_id"
        )
        return (
            fused.withColumn("rank", F.row_number().over(w).cast("int"))
            .filter(F.col("rank") <= S.TOP_K)
        )

    # eager (round 11, mechanism refined round 12): the catalog's
    # fused consumers (ann_eval_fusion_gain's 3-branch union, whose
    # rrf branch NESTS the lsh/ivf caches) do NOT populate these lazy
    # persists — every consumer was silently re-running the builder
    # (measured: lsh/rrf entries cost 1.8-2.5 s as "cache reads",
    # 0.25 s once actually cached). A SIMPLE broadcast consumer DOES
    # populate (pinned both ways in tests/test_round12_ops.py); the
    # skip is specific to the nested-cache/union shape. One count()
    # at build time fills the cache for everyone either way.
    return C.family(spark, "similarity.topk.rrf", sf_dir, build, eager=True)


def _fusion_gain_oracle() -> str:
    from ..catalog import REGISTRY as _R

    branches = " UNION ALL ".join(
        f"""
        SELECT '{label}' AS retriever,
               CAST(COUNT(ap.neighbor_id) AS BIGINT) AS n_hits,
               CAST(COUNT(ap.neighbor_id) AS DOUBLE)
                 / {_N_QUERIES * S.TOP_K}.0 AS mean_recall_at_k
        FROM gt LEFT JOIN ({_R[name].oracle}) ap
          ON ap.query_id = gt.query_id AND ap.neighbor_id = gt.neighbor_id
        """
        for label, name in [
            ("ivf", "ann_ivf_topk"),
            ("lsh", "ann_lsh_topk"),
            ("rrf", "ann_rrf_fusion"),
        ]
    )
    return f"""
    WITH gt AS (
      SELECT query_id, neighbor_id FROM ({_R["ann_cosine_topk"].oracle})
    )
    SELECT * FROM ({branches}) ORDER BY retriever
    """


@register("ann_eval_fusion_gain", oracle=_vemb(_fusion_gain_oracle()))
def ann_eval_fusion_gain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Does fusing the two approximate indexes actually buy recall? One
    summary row per retriever (ivf, lsh, rrf) with hits against the
    exact brute-force top-k and the mean recall@k — the ablation table
    that justifies (or kills) running a second index at 100 TB. All
    inputs are the already-registered oracle-checked plans over the
    shared embeddings cache; recall is an exact small-integer ratio
    (one correctly-rounded divide), so the whole report hash-checks.

    Round 12 (optimization, guide §2.6): the four eager topk caches
    this entry consumes are independent builds — warm them on
    concurrent driver threads instead of absorbing them serially
    (round-11 verdict item 1: serial absorption measured 3.3 -> 7.4 s
    quiet-to-quiet; the rrf thread blocks on lsh/ivf's per-key build
    locks and then composes from their caches). Results are unchanged:
    warming only materializes the same family caches earlier."""
    C.warm_concurrently(
        [
            lambda: _brute_topk_cached(spark, sf_dir),
            lambda: _ivf_topk_cached(spark, sf_dir),
            lambda: _lsh_topk_cached(spark, sf_dir),
            lambda: _rrf_fusion_cached(spark, sf_dir),
        ]
    )
    gt = ann_cosine_topk(spark, sf_dir).select("query_id", "neighbor_id")
    denom = float(_N_QUERIES * S.TOP_K)
    outs = []
    for label, fn in [
        ("ivf", ann_ivf_topk),
        ("lsh", ann_lsh_topk),
        ("rrf", ann_rrf_fusion),
    ]:
        ap = fn(spark, sf_dir).select(
            "query_id", F.col("neighbor_id").alias("ap_nid")
        )
        outs.append(
            gt.join(
                ap,
                (ap["query_id"] == gt["query_id"])
                & (F.col("ap_nid") == gt["neighbor_id"]),
                "left",
            ).agg(
                F.lit(label).alias("retriever"),
                F.count("ap_nid").cast("bigint").alias("n_hits"),
                (F.count("ap_nid").cast("double") / denom).alias(
                    "mean_recall_at_k"
                ),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionAll(o)
    return out.orderBy("retriever")
