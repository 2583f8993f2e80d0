"""Vector math over ``array<float>`` embedding columns, as JVM-side
higher-order functions — no Python in the hot path.

Determinism: the dot product is a LEFT FOLD (F.aggregate) over
double-widened elements, matching DuckDB's ``list_reduce`` fold order
element-for-element, so cosines agree bit-for-bit with the oracle.
``sqrt`` is IEEE-754 correctly-rounded in both engines.

At scale: these expressions vectorize inside whole-stage codegen; for
very high dimensions a pandas_udf over Arrow batches (numpy dot) wins —
that variant lives in operators/similarity.py as the documented
alternative.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# The embeddings-table dimension contract. At 100 TB the dimension is
# schema metadata known a priori (the embedding model's output width);
# the fixtures ship dim-64 vectors at every SF. Vectors that violate
# the contract — NULL, empty, wrong length, or containing NULL
# components — are EXCLUDED from every vector operator like NULL keys
# (round-9 vector-shape pin): zip_with over ragged arrays silently
# NULL-pads, np.vstack in the Arrow kernels raises, and DuckDB
# list_zip pads with NULLs — three different failure modes for the
# same malformed row unless it is fenced at the load boundary.
# Non-finite VALUES (NaN/±Inf) are a different, already-pinned family
# (float-edge probe) and pass this shape check.
VEC_DIM = 64


def valid_vec(a: Column, dim: int = VEC_DIM) -> Column:
    """Shape-contract predicate: non-NULL, exactly ``dim`` components,
    no NULL components. SQL twin: valid_vec_sql."""
    return (
        a.isNotNull()
        & (F.size(a) == dim)
        & ~F.exists(a, lambda x: x.isNull())
    )


def valid_vec_sql(a: str, dim: int = VEC_DIM) -> str:
    return (
        f"({a} IS NOT NULL AND len({a}) = {dim}"
        f" AND len(list_filter({a}, x -> x IS NULL)) = 0)"
    )


def dot(a: Column, b: Column) -> Column:
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, v: acc + v)


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    # try_divide, not `/`: a zero-norm vector makes the divisor 0.0,
    # which ANSI Spark raises on while DuckDB's float division returns
    # NULL — try_divide IS DuckDB's semantics (round-8 edge-relational
    # probe). Clean embeddings are unaffected.
    return F.try_divide(dot(a, b), norm(a) * norm(b))


# --- SQL twins (DuckDB) -----------------------------------------------------


def dot_sql(a: str, b: str) -> str:
    return (
        f"list_reduce(list_transform(list_zip({a}, {b}), "
        f"x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)), (acc, v) -> acc + v)"
    )


def norm_sql(a: str) -> str:
    return f"sqrt({dot_sql(a, a)})"


def cosine_sql(a: str, b: str) -> str:
    return f"({dot_sql(a, b)} / ({norm_sql(a)} * {norm_sql(b)}))"
