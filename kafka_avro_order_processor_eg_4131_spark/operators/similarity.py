"""Similarity search over embedding columns (north-star extension).

Two execution paths:
- ``brute_force_topk``: exact cosine top-k via join + window. The join
  is query-set x corpus — fine when the query set is small or blocked;
  this is the correctness baseline every ANN variant is validated
  against.
- ``lsh_topk``: random-hyperplane (sign) LSH — each vector gets a
  ``num_planes``-bit bucket; candidates are bucket-equal pairs only.
  At 100 TB the bucket join replaces the quadratic cross join; recall
  is tunable with more tables/probes. Hyperplanes here are data
  vectors (first ``num_planes`` of the corpus) so the whole pipeline
  is deterministic and oracle-checkable — a production variant would
  draw Gaussian planes from a fixed seed instead.

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

NUM_PLANES = 8
TOP_K = 5


def brute_force_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = TOP_K,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k neighbors (cosine) of each query vector, self excluded.
    Ties broken by neighbor id — fully deterministic."""
    from ..functions.vectors import norm

    width = emb.sparkSession.sparkContext.defaultParallelism * 2
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qvec"),
        norm(F.col(vec_col)).alias("qnrm"),
    )
    # corpus side carries the parallelism of the nested-loop join (the
    # small query set is broadcast); widen it and precompute norms once
    c = emb.repartition(width).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cvec"),
        norm(F.col(vec_col)).alias("cnrm"),
    )
    scored = (
        q.crossJoin(c)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            (dot(F.col("qvec"), F.col("cvec")) / (F.col("qnrm") * F.col("cnrm"))).alias(
                "cos"
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
    )


def lsh_bucket(emb: DataFrame, planes: DataFrame, id_col: str = "vec_id",
               vec_col: str = "embedding") -> DataFrame:
    """Assign each vector its sign-LSH bucket: bit j = (dot(v, plane_j) >= 0).
    ``planes`` must be small (it is broadcast and exploded per row)."""
    plane_rows = planes.select(
        F.col("plane_id"), F.col(vec_col).alias("pvec")
    )
    width = emb.sparkSession.sparkContext.defaultParallelism * 2
    bits = (
        emb.repartition(width)
        .select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec"))
        .crossJoin(F.broadcast(plane_rows))
        .select(
            "id",
            "vec",
            "plane_id",
            F.when(dot(F.col("vec"), F.col("pvec")) >= 0, 1).otherwise(0).alias("bit"),
        )
    )
    return bits.groupBy("id", "vec").agg(
        F.sum(F.col("bit").cast("long") * F.pow(F.lit(2.0), F.col("plane_id")).cast("long"))
        .cast("long")
        .alias("bucket")
    )


def lsh_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = TOP_K,
    num_planes: int = NUM_PLANES,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: exact cosine ranking *within* the query's LSH
    bucket. Planes = the first ``num_planes`` corpus vectors (by id)."""
    planes = (
        emb.orderBy(id_col)
        .limit(num_planes)
        .select(
            F.row_number().over(Window.orderBy(id_col)).alias("rn"),
            F.col(vec_col),
        )
        .select((F.col("rn") - 1).alias("plane_id"), vec_col)
    )
    bucketed = lsh_bucket(emb, planes, id_col, vec_col)
    q = queries.select(F.col(id_col).alias("query_id")).join(
        bucketed.select(
            F.col("id").alias("query_id"),
            F.col("vec").alias("qvec"),
            F.col("bucket").alias("qbucket"),
        ),
        "query_id",
    )
    c = bucketed.select(
        F.col("id").alias("neighbor_id"),
        F.col("vec").alias("cvec"),
        F.col("bucket").alias("cbucket"),
    )
    scored = (
        q.join(c, F.col("qbucket") == F.col("cbucket"))
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine(F.col("qvec"), F.col("cvec")).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w).cast("int")).filter(
        F.col("rank") <= k
    )


NUM_CELLS = 8
NUM_PROBES = 2


def ivf_assign(emb: DataFrame, centroids: DataFrame, n_probe: int = 1,
               id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """IVF cell assignment: each vector joins its ``n_probe`` highest-
    cosine centroids. Centroids must be small (broadcast)."""
    from ..functions.vectors import norm as vnorm

    width = emb.sparkSession.sparkContext.defaultParallelism * 2
    c = centroids.select(
        F.col("cell_id"), F.col(vec_col).alias("cvec"), vnorm(F.col(vec_col)).alias("cnrm")
    )
    scored = (
        emb.repartition(width)
        .select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec"),
                vnorm(F.col(vec_col)).alias("vnrm"))
        .crossJoin(F.broadcast(c))
        .select(
            "id", "vec",
            "cell_id",
            (dot(F.col("vec"), F.col("cvec")) / (F.col("vnrm") * F.col("cnrm"))).alias("aff"),
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
) -> DataFrame:
    """IVF (inverted-file) ANN: corpus vectors indexed into their single
    nearest cell; queries probe their ``n_probe`` nearest cells and rank
    exactly within them. Centroids = the first ``num_cells`` corpus
    vectors by id (deterministic, oracle-checkable; production would
    k-means from a seed — the plan shape is identical)."""
    from ..functions.vectors import norm as vnorm

    centroids = (
        emb.orderBy(id_col)
        .limit(num_cells)
        .select(
            (F.row_number().over(Window.orderBy(id_col)) - 1).alias("cell_id"),
            F.col(vec_col),
        )
    )
    corpus_cells = ivf_assign(emb, centroids, n_probe=1, id_col=id_col, vec_col=vec_col)
    query_cells = ivf_assign(
        queries, centroids, n_probe=n_probe, id_col=id_col, vec_col=vec_col
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
            (dot(F.col("qvec"), F.col("cvec")) / (F.col("qnrm") * F.col("cnrm"))).alias("cos"),
        )
        .distinct()  # a neighbor can reach the query through both probed cells
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
