"""Window functions (SURVEY.md §2.7): ranking, analytic (lag/lead),
aggregate-over-frame (rows & range), ntile/percent_rank/cume_dist.

Determinism rules applied throughout:
- every ORDER BY inside a window ends in a unique key, so ranks and
  lag/lead are reproducible;
- NULLABLE sort keys carry an explicit NULLS LAST on BOTH sides:
  Spark defaults to NULLS FIRST for ASC, DuckDB to NULLS LAST — on the
  clean fixtures (no null dates) the divergence is invisible, on a
  null-bearing corpus every frame shifts (round-8 edge probe);
- windowed sums of doubles go through DECIMAL(30,6) — DuckDB evaluates
  frames with a segment tree (arbitrary add order), Spark incrementally;
  only an exact type makes them agree.

Scale: one shuffle on partitionBy key + per-partition sort. Heavily
skewed partition keys (one giant customer) would serialize — noted per
query where the key distribution makes that impossible here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import DEC, dsum_over, dsum_over_sql, load, register

# window texts for the dsum_over_sql oracles (shared so the Spark-side
# frame and the SQL frame can be eyeballed for equivalence)
_RUNNING_W = (
    "OVER (PARTITION BY o_custkey ORDER BY o_orderdate NULLS LAST, "
    "o_orderkey ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
)
_MOVING4_W = (
    "OVER (PARTITION BY o_custkey ORDER BY o_orderdate NULLS LAST, "
    "o_orderkey ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)"
)


@register(
    "window_top3_orders_per_customer",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice, CAST(rn AS INT) AS rn
    FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders
    ) WHERE rn <= 3
    """,
)
def window_top3_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped top-k via ROW_NUMBER — the scalable alternative to
    per-group ORDER BY/LIMIT loops."""
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        o.withColumn("rn", F.row_number().over(w).cast("int"))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
    )


@register(
    "window_rank_functions",
    oracle="""
    SELECT o_orderkey,
           CAST(RANK()       OVER w AS INT) AS rnk,
           CAST(DENSE_RANK() OVER w AS INT) AS drnk,
           CAST(NTILE(4)     OVER w AS INT) AS quartile,
           PERCENT_RANK()    OVER w         AS prank,
           CUME_DIST()       OVER w         AS cdist
    FROM orders
    WINDOW w AS (PARTITION BY o_orderstatus
                 ORDER BY o_totalprice NULLS LAST, o_orderkey)
    """,
)
def window_rank_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full ranking-function surface over one window. NULLS LAST is
    pinned explicitly on both sides (Spark default NULLS FIRST, DuckDB
    NULLS LAST — round-9 float-edge probe, a NULL price flips every
    rank in its partition otherwise); NaN needs no pin (both engines
    order it largest)."""
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderstatus").orderBy(
        F.col("o_totalprice").asc_nulls_last(), "o_orderkey"
    )
    return o.select(
        "o_orderkey",
        F.rank().over(w).cast("int").alias("rnk"),
        F.dense_rank().over(w).cast("int").alias("drnk"),
        F.ntile(4).over(w).cast("int").alias("quartile"),
        F.percent_rank().over(w).alias("prank"),
        F.cume_dist().over(w).alias("cdist"),
    )


@register(
    "window_lag_lead_price_delta",
    oracle="""
    SELECT o_custkey, o_orderkey,
           o_totalprice - LAG(o_totalprice)  OVER w AS delta_prev,
           LEAD(o_totalprice) OVER w - o_totalprice AS delta_next
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate NULLS LAST, o_orderkey)
    """,
)
def window_lag_lead_price_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LAG/LEAD analytics: per-customer order-to-order price deltas
    (row-level double arithmetic — IEEE-identical across engines)."""
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_orderdate").asc_nulls_last(), "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        (F.col("o_totalprice") - F.lag("o_totalprice").over(w)).alias("delta_prev"),
        (F.lead("o_totalprice").over(w) - F.col("o_totalprice")).alias("delta_next"),
    )


@register(
    "window_running_total",
    oracle=f"""
    SELECT o_custkey, o_orderkey,
           {dsum_over_sql("o_totalprice", _RUNNING_W)} AS running_spend
    FROM orders
    """,
)
def window_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running total over an expanding ROWS frame (decimal-exact;
    dsum_over propagates NaN/±Inf through the frame identically in
    both engines — round-9 float-edge probe)."""
    o = load(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.col("o_orderdate").asc_nulls_last(), "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        dsum_over(F.col("o_totalprice"), w).alias("running_spend"),
    )


@register(
    "window_moving_avg",
    oracle=f"""
    SELECT o_custkey, o_orderkey,
           {dsum_over_sql("o_totalprice", _MOVING4_W)}
             / COUNT(*) {_MOVING4_W} AS moving_avg_4
    FROM orders
    """,
)
def window_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Moving average over a sliding 4-row frame (exact sum / count;
    dsum_over propagates NaN/±Inf through the frame — round-9)."""
    o = load(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.col("o_orderdate").asc_nulls_last(), "o_orderkey")
        .rowsBetween(-3, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        (dsum_over(F.col("o_totalprice"), w) / F.count("*").over(w)).alias(
            "moving_avg_4"
        ),
    )


@register(
    "window_range_frame_peers",
    oracle="""
    SELECT o_orderkey,
           CAST(COUNT(*) OVER (PARTITION BY o_orderstatus
                               ORDER BY o_totalprice
                               RANGE BETWEEN 1000.0 PRECEDING AND CURRENT ROW)
                AS BIGINT) AS peers_within_1000
    FROM orders
    """,
)
def window_range_frame_peers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame (value-based): how many same-status orders fall within
    1000 below this order's price. Value frames are sort-tie-insensitive,
    so no tiebreak column is needed."""
    o = load(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_orderstatus")
        .orderBy("o_totalprice")
        .rangeBetween(-1000, Window.currentRow)
    )
    return o.select(
        "o_orderkey",
        F.count("*").over(w).alias("peers_within_1000"),
    )


@register(
    "window_first_last_value",
    oracle="""
    SELECT o_custkey, o_orderkey,
           FIRST_VALUE(o_orderkey) OVER w AS first_order,
           LAST_VALUE(o_orderkey)  OVER (PARTITION BY o_custkey
                                         ORDER BY o_orderdate NULLS LAST, o_orderkey
                                         ROWS BETWEEN UNBOUNDED PRECEDING
                                                  AND UNBOUNDED FOLLOWING)
                                          AS last_order
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate NULLS LAST, o_orderkey)
    """,
)
def window_first_last_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FIRST_VALUE / LAST_VALUE with an explicit full frame for last
    (the default frame would stop at CURRENT ROW)."""
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_orderdate").asc_nulls_last(), "o_orderkey")
    wfull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.first("o_orderkey").over(w).alias("first_order"),
        F.last("o_orderkey").over(wfull).alias("last_order"),
    )


@register(
    "window_nth_value",
    oracle="""
    SELECT o_custkey, o_orderkey,
           NTH_VALUE(o_orderkey, 2) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate NULLS LAST, o_orderkey
           ) AS second_order
    FROM orders
    """,
)
def window_nth_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NTH_VALUE with the default running frame: NULL until the
    partition's 2nd row (by date, unique-key tiebreak) enters the
    frame, then that key thereafter."""
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_orderdate").asc_nulls_last(), "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.nth_value("o_orderkey", 2).over(w).alias("second_order"),
    )
