"""Similarity-search queries over ``embeddings`` (north-star extension;
operators in operators/similarity.py). Query set = vec_id < 20 keeps
the fixture-scale join bounded while exercising the full ranking path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load, register
from ..functions.vectors import cosine_sql, dot_sql
from ..operators import similarity as S

_N_QUERIES = 20

_COS = cosine_sql("q.embedding", "c.embedding")


@register(
    "ann_cosine_topk",
    oracle=f"""
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
    """,
)
def ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-5 per query vector — the brute-force baseline.
    Dot products are left-fold doubles (functions/vectors.py), so the
    scores are bit-identical to DuckDB's list_reduce fold."""
    e = load(spark, sf_dir, "embeddings")
    queries = e.filter(F.col("vec_id") < _N_QUERIES)
    return S.brute_force_topk(e, queries)


@register(
    "ann_ivf_topk",
    oracle=f"""
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
    """,
)
def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN: corpus indexed into nearest-centroid cells, queries probe
    their 2 nearest cells, exact ranking within the probed cells — the
    inverted-file scale path (candidates ~ corpus/num_cells * probes)."""
    e = load(spark, sf_dir, "embeddings")
    queries = e.filter(F.col("vec_id") < _N_QUERIES)
    return S.ivf_topk(e, queries)


@register(
    "ann_lsh_topk",
    oracle=f"""
    WITH planes AS (
      SELECT vec_id AS plane_id_src, embedding,
             CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS INT) AS plane_id
      FROM embeddings ORDER BY vec_id LIMIT {S.NUM_PLANES}
    ),
    bucketed AS (
      SELECT e.vec_id AS id, e.embedding AS vec,
             CAST(SUM(CASE WHEN {dot_sql("e.embedding", "p.embedding")} >= 0
                      THEN CAST(POW(2.0, p.plane_id) AS BIGINT) ELSE 0 END) AS BIGINT)
               AS bucket
      FROM embeddings e CROSS JOIN planes p
      GROUP BY e.vec_id, e.embedding
    ),
    scored AS (
      SELECT q.id AS query_id, c.id AS neighbor_id,
             {cosine_sql("q.vec", "c.vec")} AS cos
      FROM bucketed q JOIN bucketed c
        ON q.bucket = c.bucket AND q.id <> c.id
      WHERE q.id < {_N_QUERIES}
    ),
    ranked AS (
      SELECT query_id, neighbor_id, cos,
             CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                                     ORDER BY cos DESC, neighbor_id) AS INT) AS rank
      FROM scored
    )
    SELECT query_id, neighbor_id, cos, rank FROM ranked WHERE rank <= {S.TOP_K}
    """,
)
def ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-5 via sign-LSH buckets (8 data-derived
    hyperplanes): candidates restricted to the query's bucket — the
    scale path replacing the quadratic cross join."""
    e = load(spark, sf_dir, "embeddings")
    queries = e.filter(F.col("vec_id") < _N_QUERIES)
    return S.lsh_topk(e, queries)
