"""Deterministic streaming sketches with EXACT SQL oracles.

The native sketch aggregates (``approx_percentile``,
``approx_count_distinct``) stay rows-only — their register layouts are
engine-internal. These queries instead implement the sketch STRUCTURES
from first principles on md5-derived hash families (the catalog's
portable hash discipline), which makes every register and every
estimate bit-reproducible in DuckDB: the sketches a 100 TB pipeline
actually ships to a dashboard (heavy-hitter counts, distinct users)
become hash-checked instead of trust-me.

Scale shapes: a count-min build is one explode x depth + one (depth,
bucket) hash aggregate — fixed d*w state per executor, merged by
addition (the definition of a mergeable sketch). The HLL register
table is one hash aggregate on bucket with a max combiner — 64 rows
out regardless of input size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load, register
from ..operators import cache as C
from ..functions import text as T

# ---------------------------------------------------------------------------
# portable md5 -> integer helpers (hex-digit folding, textops.py family)
# ---------------------------------------------------------------------------


def _hexfold_sql(md5_expr: str, start: int, n: int) -> str:
    """SQL: integer value of ``n`` hex digits of ``md5_expr`` starting at
    1-based position ``start``."""
    terms = " + ".join(
        f"CAST((strpos('0123456789abcdef', substring({md5_expr}, {start + i}, 1)) - 1)"
        f" AS BIGINT) * {16 ** (n - 1 - i)}"
        for i in range(n)
    )
    return f"({terms})"


# ---------------------------------------------------------------------------
# count-min sketch over the document token stream
# ---------------------------------------------------------------------------

_CMS_D = 4  # hash rows
_CMS_W = 64  # buckets per row
_CMS_TOP = 10  # probed heavy hitters

_CMS_MD5 = "md5(CAST(depth AS VARCHAR) || ':' || tok)"
_CMS_BUCKET_SQL = f"({_hexfold_sql(_CMS_MD5, 1, 8)} % {_CMS_W})"


def _cms_bucket(depth, tok) -> F.Column:
    return (
        F.conv(
            F.substring(
                F.md5(F.concat(depth.cast("string"), F.lit(":"), tok)), 1, 8
            ),
            16,
            10,
        ).cast("long")
        % _CMS_W
    )


@register(
    "sketch_countmin_heavy_terms",
    oracle=f"""
    WITH tok AS (
      SELECT unnest(list_filter(string_split(replace(translate(lower(trim(regexp_replace(text, '[ \\t\\n\\x0b\\f\\r]+', ' ', 'g'))), 'ς', 'σ'), 'i' || chr(775), 'i'), ' '), t -> t <> '')) AS tok
      FROM documents WHERE trim(text) <> ''
    ), truec AS (
      SELECT tok, CAST(COUNT(*) AS BIGINT) AS true_count FROM tok GROUP BY tok
    ), depths AS (
      SELECT unnest(generate_series(0, {_CMS_D - 1})) AS depth
    ), cms AS (
      SELECT depth, {_CMS_BUCKET_SQL} AS bucket, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM tok CROSS JOIN depths GROUP BY 1, 2
    ), top AS (
      SELECT tok, true_count FROM truec
      ORDER BY true_count DESC, tok LIMIT {_CMS_TOP}
    ), probe AS (
      SELECT tok, true_count, depth, {_CMS_BUCKET_SQL} AS bucket
      FROM top CROSS JOIN depths
    )
    SELECT probe.tok AS term, probe.true_count,
           CAST(MIN(cms.cnt) AS BIGINT) AS cms_estimate
    FROM probe JOIN cms USING (depth, bucket)
    GROUP BY 1, 2
    """,
)
def sketch_countmin_heavy_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch build + point query, fully deterministic:
    4 md5-salted hash rows x 64 buckets over the corpus token stream,
    then the top-10 true heavy hitters probed back through the sketch
    (estimate = min over rows of their bucket counters; CMS guarantees
    estimate >= truth, equality when no collision). The build is one
    explode x depth + one (depth,bucket) aggregate whose state is a
    fixed 256 counters per executor merged by addition — the mergeable-
    sketch scale shape; the probe side is TakeOrdered(10) + a broadcast
    join against the 256-row sketch. True counts ride along so the
    oracle doubles as a collision-error report."""
    from ..operators.dedup import _widen

    d = _widen(load(spark, sf_dir, "documents").filter(F.trim(F.col("text")) != ""))
    tok = C.ephemeral(d.select(F.explode(T.norm_tokens(F.col("text"))).alias("tok")))
    truec = tok.groupBy("tok").agg(F.count("*").alias("true_count"))
    depths = F.array([F.lit(i) for i in range(_CMS_D)])
    cms = (
        tok.select("tok", F.explode(depths).alias("depth"))
        .select("depth", _cms_bucket(F.col("depth"), F.col("tok")).alias("bucket"))
        .groupBy("depth", "bucket")
        .agg(F.count("*").alias("cnt"))
    )
    top = truec.orderBy(F.col("true_count").desc(), "tok").limit(_CMS_TOP)
    probe = top.select(
        F.col("tok"), "true_count", F.explode(depths).alias("depth")
    ).select(
        "tok",
        "true_count",
        "depth",
        _cms_bucket(F.col("depth"), F.col("tok")).alias("bucket"),
    )
    return (
        probe.join(F.broadcast(cms), ["depth", "bucket"])
        .groupBy(F.col("tok").alias("term"), "true_count")
        .agg(F.min("cnt").cast("bigint").alias("cms_estimate"))
    )


# ---------------------------------------------------------------------------
# HyperLogLog over order customer keys
# ---------------------------------------------------------------------------

_HLL_M = 64  # registers (b = 6)
_HLL_VBITS = 48  # hash bits ranked for leading zeros (12 hex digits)

_HLL_MD5 = "md5(CAST(o_custkey AS VARCHAR))"
_HLL_BUCKET_SQL = f"({_hexfold_sql(_HLL_MD5, 1, 2)} % {_HLL_M})"
_HLL_V_SQL = _hexfold_sql(_HLL_MD5, 3, 12)
# rho = leading zeros of the 48-bit v, + 1; binary-repr length gives the
# MSB position identically in both engines (Spark bin(), DuckDB bin())
_HLL_RHO_SQL = (
    f"CASE WHEN {_HLL_V_SQL} = 0 THEN {_HLL_VBITS + 1} "
    f"ELSE {_HLL_VBITS} - length(bin({_HLL_V_SQL})) + 1 END"
)


def _hll_parts() -> tuple[F.Column, F.Column]:
    md5 = F.md5(F.col("o_custkey").cast("string"))
    bucket = F.conv(F.substring(md5, 1, 2), 16, 10).cast("long") % _HLL_M
    v = F.conv(F.substring(md5, 3, 12), 16, 10).cast("long")
    rho = F.when(v == 0, F.lit(_HLL_VBITS + 1)).otherwise(
        F.lit(_HLL_VBITS) - F.length(F.bin(v)) + 1
    )
    return bucket, rho


@register(
    "sketch_hll_registers",
    oracle=f"""
    SELECT CAST({_HLL_BUCKET_SQL} AS INT) AS bucket,
           CAST(MAX({_HLL_RHO_SQL}) AS INT) AS register
    FROM orders GROUP BY 1
    """,
)
def sketch_hll_registers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog register table over order customer keys: bucket =
    md5 first 2 hex digits mod 64, register = max over the bucket of
    (leading zeros of the next 48 hash bits + 1). One hash aggregate
    with a max combiner; 64 rows out at ANY input size — the state a
    distinct-count dashboard actually stores and merges. Deterministic
    md5 hashing makes the registers themselves oracle-checkable, not
    just the final estimate."""
    o = load(spark, sf_dir, "orders")
    bucket, rho = _hll_parts()
    return (
        o.select(bucket.cast("int").alias("bucket"), rho.alias("rho"))
        .groupBy("bucket")
        .agg(F.max("rho").cast("int").alias("register"))
    )


@register(
    "sketch_hll_estimate",
    oracle=f"""
    WITH regs AS (
      SELECT {_HLL_BUCKET_SQL} AS bucket, MAX({_HLL_RHO_SQL}) AS register
      FROM orders GROUP BY 1
    ), s AS (
      SELECT CAST(SUM((CAST(1 AS BIGINT) << ({_HLL_VBITS + 1} - register)))
                  AS BIGINT) AS sum_scaled,
             CAST(COUNT(*) AS BIGINT) AS n_regs
      FROM regs
    )
    SELECT n_regs,
           (SELECT CAST(COUNT(DISTINCT o_custkey) AS BIGINT) FROM orders)
             AS n_exact,
           ((0.7213 / (1.0 + 1.079 / {_HLL_M}.0))
             * {_HLL_M * _HLL_M}.0 * {2 ** (_HLL_VBITS + 1)}.0
             / (CAST(sum_scaled AS DOUBLE)
                + (CAST(({_HLL_M} - n_regs) AS DOUBLE)
                   * {2 ** (_HLL_VBITS + 1)}.0))) AS hll_estimate
    FROM s
    """,
)
def sketch_hll_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The HLL cardinality estimate from the register table, computed
    with EXACT integer arithmetic until the final constant multiply and
    one IEEE divide: sum(2^-register) is kept as the scaled integer
    sum(2^(49-register)) (a BIGINT — max 64 * 2^49 < 2^56), empty
    registers contribute 2^49 each, and alpha_64 = 0.7213/(1+1.079/64)
    is evaluated with the identical literal expression in both engines.
    No pow(), no transcendental, no float sum — the whole estimate is
    bit-portable. (The small-range linear-counting correction is
    deliberately omitted; the raw estimator is what's being pinned.)
    n_exact rides along so the row doubles as an accuracy report."""
    o = load(spark, sf_dir, "orders")
    bucket, rho = _hll_parts()
    regs = (
        o.select(bucket.alias("bucket"), rho.alias("rho"))
        .groupBy("bucket")
        .agg(F.max("rho").alias("register"))
    )
    s = regs.agg(
        F.sum(
            # F.shiftleft only takes a literal shift; the SQL form takes
            # an expression in both engines
            F.expr(f"shiftleft(CAST(1 AS BIGINT), {_HLL_VBITS + 1} - register)")
        )
        .cast("bigint")
        .alias("sum_scaled"),
        F.count("*").cast("bigint").alias("n_regs"),
    )
    n_exact = o.agg(F.count_distinct("o_custkey").cast("bigint").alias("n_exact"))
    alpha = 0.7213 / (1.0 + 1.079 / float(_HLL_M))
    full = float(2 ** (_HLL_VBITS + 1))
    est = (
        F.lit(alpha)
        * F.lit(float(_HLL_M * _HLL_M))
        * F.lit(full)
        / (
            F.col("sum_scaled").cast("double")
            + (F.lit(_HLL_M) - F.col("n_regs")).cast("double") * F.lit(full)
        )
    )
    return (
        s.crossJoin(F.broadcast(n_exact))
        .select("n_regs", "n_exact", est.alias("hll_estimate"))
    )


def _hll_est_sql(regs: str) -> str:
    """The exact-integer HLL estimator over a (bucket, register) CTE —
    shared by the single-sketch and merged-sketch queries so the
    arithmetic cannot drift."""
    return f"""(
      SELECT ((0.7213 / (1.0 + 1.079 / {_HLL_M}.0))
               * {_HLL_M * _HLL_M}.0 * {2 ** (_HLL_VBITS + 1)}.0
               / (CAST(CAST(SUM((CAST(1 AS BIGINT)
                      << ({_HLL_VBITS + 1} - register))) AS BIGINT) AS DOUBLE)
                  + (CAST(({_HLL_M} - COUNT(*)) AS DOUBLE)
                     * {2 ** (_HLL_VBITS + 1)}.0)))
      FROM {regs}
    )"""


def _hll_estimate_from(regs: DataFrame) -> DataFrame:
    """1-row (est double) from a (bucket, register) relation — the
    Spark twin of _hll_est_sql."""
    s = regs.agg(
        F.sum(
            F.expr(f"shiftleft(CAST(1 AS BIGINT), {_HLL_VBITS + 1} - register)")
        )
        .cast("bigint")
        .alias("sum_scaled"),
        F.count("*").cast("bigint").alias("n_regs"),
    )
    alpha = 0.7213 / (1.0 + 1.079 / float(_HLL_M))
    full = float(2 ** (_HLL_VBITS + 1))
    return s.select(
        (
            F.lit(alpha)
            * F.lit(float(_HLL_M * _HLL_M))
            * F.lit(full)
            / (
                F.col("sum_scaled").cast("double")
                + (F.lit(_HLL_M) - F.col("n_regs")).cast("double") * F.lit(full)
            )
        ).alias("est")
    )


@register(
    "sketch_hll_merge_sources",
    oracle=f"""
    WITH per AS (
      SELECT o_orderpriority AS src, CAST({_HLL_BUCKET_SQL} AS INT) AS bucket,
             CAST(MAX({_HLL_RHO_SQL}) AS INT) AS register
      FROM orders GROUP BY 1, 2
    ),
    merged AS (
      SELECT bucket, MAX(register) AS register FROM per GROUP BY bucket
    ),
    gall AS (
      SELECT CAST({_HLL_BUCKET_SQL} AS INT) AS bucket,
             CAST(MAX({_HLL_RHO_SQL}) AS INT) AS register
      FROM orders GROUP BY 1
    ),
    mism AS (
      SELECT CAST(SUM(CASE WHEN m.register IS NULL OR g.register IS NULL
                             OR m.register <> g.register
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_mismatches
      FROM merged m FULL OUTER JOIN gall g ON m.bucket = g.bucket
    )
    SELECT (SELECT CAST(COUNT(DISTINCT src) AS BIGINT) FROM per) AS n_sources,
           mism.n_mismatches,
           {_hll_est_sql("merged")} AS merged_estimate,
           {_hll_est_sql("gall")} AS global_estimate
    FROM mism
    """,
)
def sketch_hll_merge_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch MERGEABILITY — the property that makes HLL the 100 TB
    distinct counter: per-source register tables (one per order
    priority, standing in for per-shard / per-day sketches) merge by a
    bucketwise MAX into EXACTLY the register table a global pass
    builds, because max is associative and commutative. The output row
    carries the proof: zero register mismatches and bit-identical
    merged vs global estimates. At scale this is the union story — 64
    registers per shard travel to the coordinator instead of the key
    sets themselves."""
    o = load(spark, sf_dir, "orders")
    bucket, rho = _hll_parts()
    per = (
        o.select(
            F.col("o_orderpriority").alias("src"),
            bucket.cast("int").alias("bucket"),
            rho.alias("rho"),
        )
        .groupBy("src", "bucket")
        .agg(F.max("rho").cast("int").alias("register"))
    )
    merged = per.groupBy("bucket").agg(F.max("register").alias("register"))
    glob = (
        o.select(bucket.cast("int").alias("bucket"), rho.alias("rho"))
        .groupBy("bucket")
        .agg(F.max("rho").cast("int").alias("register"))
    )
    m = merged.select("bucket", F.col("register").alias("rm"))
    g = glob.select("bucket", F.col("register").alias("rg"))
    mism = (
        m.join(g, "bucket", "full_outer")
        .agg(
            F.sum(
                F.when(
                    F.col("rm").isNull()
                    | F.col("rg").isNull()
                    | (F.col("rm") != F.col("rg")),
                    1,
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("n_mismatches")
        )
    )
    n_src = per.agg(F.count_distinct("src").cast("bigint").alias("n_sources"))
    em = _hll_estimate_from(merged).select(F.col("est").alias("merged_estimate"))
    eg = _hll_estimate_from(glob).select(F.col("est").alias("global_estimate"))
    return (
        n_src.crossJoin(F.broadcast(mism))
        .crossJoin(F.broadcast(em))
        .crossJoin(F.broadcast(eg))
        .select("n_sources", "n_mismatches", "merged_estimate", "global_estimate")
    )
