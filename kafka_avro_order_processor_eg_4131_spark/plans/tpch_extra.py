"""Broader TPC-H-shape coverage (SURVEY.md §2.7 "joins / subqueries /
aggregation" families) adapted to the fixture schemas.

The fixtures carry a narrowed TPC-H schema (TESTDATA.md): no partsupp
table, no l_commitdate/l_receiptdate/l_shipmode, no p_container, and
synthetic value domains (nations are ``NATION_<k>``, part names are
"<adjective> <noun>" with colors like ``red``). Each query below keeps
the *plan shape* of its TPC-H namesake — the join topology, subquery
decorrelation pattern, and aggregation structure are what Catalyst has
to get right at 100 TB — with predicates re-aimed at columns that
exist.

Scale posture, per shape:
- Q2/Q15/Q20 scalar subqueries become a broadcast of a 1-row (or
  tiny) aggregate — no driver collect, no second scan barrier beyond
  the aggregate itself.
- Q17's correlated aggregate decorrelates to a groupBy + broadcast-able
  join on l_partkey (part-filtered side is small after pushdown).
- Q21's EXISTS/NOT EXISTS pair becomes one left-semi and one left-anti
  join, both shuffling on l_orderkey only.
- Q13's left join keeps customer as the build side only at tiny SF;
  at scale both sides shuffle on custkey once and the count-histogram
  regroup is a 2nd tiny shuffle.

Determinism: every double aggregate goes through the decimal-sum
helpers (catalog.dsum/dsum_sql); thresholds derived from averages use
the same decimal discipline on both engines; every ORDER BY ends in a
unique key (docs/PLANS.md "Cross-engine float portability").
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import bigcount_sql, bigsum_sql, dsum, dsum_sql, load, register

_REVENUE = "l_extendedprice * (1 - l_discount)"


def _revenue_col() -> F.Column:
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


def _ts(lit: str) -> F.Column:
    return F.lit(lit).cast("timestamp_ntz")


# ---------------------------------------------------------------------------
# Q6 — single-scan conjunctive-band aggregate
# ---------------------------------------------------------------------------


@register(
    "q6_forecast_revenue",
    oracle=f"""
    SELECT {dsum_sql("l_extendedprice * l_discount")} AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate <  TIMESTAMP '1998-01-01'
      AND l_discount BETWEEN 0.04 AND 0.08
      AND l_quantity < 24
    """,
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: all three predicates push to the parquet scan
    (no join, no shuffle beyond the single global-agg exchange)."""
    l = load(spark, sf_dir, "lineitem")
    return (
        l.filter(
            (F.col("l_shipdate") >= _ts("1997-01-01"))
            & (F.col("l_shipdate") < _ts("1998-01-01"))
            & F.col("l_discount").between(0.04, 0.08)
            & (F.col("l_quantity") < 24)
        )
        .agg(dsum(F.col("l_extendedprice") * F.col("l_discount")).alias("revenue"))
    )


# ---------------------------------------------------------------------------
# Q2 — min-cost supplier per part (window top-1; partsupp-free adaptation)
# ---------------------------------------------------------------------------


@register(
    "q2_min_cost_supplier",
    oracle="""
    SELECT p_partkey, p_name, s_name, s_acctbal,
           l_extendedprice AS min_supply_cost
    FROM (
      SELECT p_partkey, p_name, s_name, s_acctbal, l_extendedprice,
             ROW_NUMBER() OVER (
               PARTITION BY p_partkey
               ORDER BY l_extendedprice, l_suppkey, l_orderkey, l_linenumber
             ) AS rn
      FROM lineitem
      JOIN part     ON l_partkey = p_partkey
      JOIN supplier ON l_suppkey = s_suppkey
      WHERE p_size BETWEEN 1 AND 10 AND p_type = 'STANDARD'
    )
    WHERE rn = 1
    ORDER BY s_acctbal DESC, p_partkey
    LIMIT 100
    """,
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (no partsupp in the fixtures: lineitem is the
    part<->supplier link). The per-part min-cost correlated subquery
    is a windowed top-1: one shuffle on l_partkey, then TakeOrdered
    for the final top-100. Tiebreaks (suppkey, orderkey, linenumber)
    make the picked row unique so both engines agree bit-for-bit."""
    l = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").filter(
        F.col("p_size").between(1, 10) & (F.col("p_type") == "STANDARD")
    )
    s = load(spark, sf_dir, "supplier")
    w = Window.partitionBy("p_partkey").orderBy(
        "l_extendedprice", "l_suppkey", "l_orderkey", "l_linenumber"
    )
    return (
        l.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "p_partkey",
            "p_name",
            "s_name",
            "s_acctbal",
            F.col("l_extendedprice").alias("min_supply_cost"),
        )
        .orderBy(F.col("s_acctbal").desc(), "p_partkey")
        .limit(100)
    )


# ---------------------------------------------------------------------------
# Q9 — multi-way join, profit by nation x year
# ---------------------------------------------------------------------------


@register(
    "q9_product_type_profit",
    oracle=f"""
    SELECT n_name AS nation,
           CAST(EXTRACT(year FROM o_orderdate) AS INTEGER) AS o_year,
           {dsum_sql(_REVENUE)} AS sum_profit
    FROM lineitem
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN part     ON l_partkey = p_partkey
    JOIN orders   ON l_orderkey = o_orderkey
    WHERE p_name LIKE 'red%'
    GROUP BY n_name, CAST(EXTRACT(year FROM o_orderdate) AS INTEGER)
    ORDER BY 1, 2 DESC
    """,
)
def q9_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (profit := revenue; no ps_supplycost to net out).
    part/supplier/nation broadcast; the only shuffles are
    lineitem-orders on orderkey and the final group."""
    l = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    p = load(spark, sf_dir, "part").filter(F.col("p_name").like("red%"))
    o = load(spark, sf_dir, "orders")
    return (
        l.join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(dsum(_revenue_col()).alias("sum_profit"))
        .orderBy("nation", F.col("o_year").desc())
    )


# ---------------------------------------------------------------------------
# Q10 — returned-item reporting (top-20 customers)
# ---------------------------------------------------------------------------


@register(
    "q10_returned_items",
    oracle=f"""
    SELECT c_custkey, c_name, {dsum_sql(_REVENUE)} AS revenue,
           c_acctbal, n_name
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1997-01-01'
      AND o_orderdate <  TIMESTAMP '1997-04-01'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: quarter + returnflag pushdown, one fact-fact
    shuffle, broadcast nation, TakeOrdered(20)."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ts("1997-01-01"))
        & (F.col("o_orderdate") < _ts("1997-04-01"))
    )
    l = load(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = load(spark, sf_dir, "nation")
    return (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"))
        .join(l, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(dsum(_revenue_col()).alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Q12 — two-bucket CASE aggregation over a fact-fact join
# ---------------------------------------------------------------------------


@register(
    "q12_priority_shipping",
    oracle=f"""
    SELECT l_returnflag AS ship_class,
           {bigsum_sql("CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END")} AS high_line_count,
           {bigsum_sql("CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END")} AS low_line_count
    FROM orders
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate <  TIMESTAMP '1998-01-01'
    GROUP BY ship_class
    ORDER BY ship_class
    """,
)
def q12_priority_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (l_shipmode absent: l_returnflag plays the ship
    class). CASE-sum pairs fold into one grouped pass after the
    orderkey shuffle."""
    o = load(spark, sf_dir, "orders")
    l = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1997-01-01"))
        & (F.col("l_shipdate") < _ts("1998-01-01"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(l, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy(F.col("l_returnflag").alias("ship_class"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("ship_class")
    )


# ---------------------------------------------------------------------------
# Q13 — customer order-count distribution (left outer + double group)
# ---------------------------------------------------------------------------


@register(
    "q13_customer_distribution",
    oracle=f"""
    SELECT c_count, {bigcount_sql()} AS custdist
    FROM (
      SELECT c_custkey, COUNT(o_orderkey) AS c_count
      FROM customer
      LEFT JOIN (SELECT * FROM orders WHERE o_orderpriority <> '1-URGENT') o
        ON c_custkey = o_custkey
      GROUP BY c_custkey
    )
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: left outer join against a filtered fact, count
    per customer, then histogram the counts (second, tiny shuffle)."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderpriority") != "1-URGENT")
    return (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


# ---------------------------------------------------------------------------
# Q14 — promo revenue share (scalar result, CASE inside the aggregate)
# ---------------------------------------------------------------------------


@register(
    "q14_promo_effect",
    oracle=f"""
    SELECT (100.0 * {dsum_sql(f"CASE WHEN p_type = 'PROMO' THEN {_REVENUE} ELSE 0.0 END")})
           / {dsum_sql(_REVENUE)} AS promo_revenue_pct
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-09-01'
      AND l_shipdate <  TIMESTAMP '1997-10-01'
    """,
)
def q14_promo_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: month-sliced fact scan, broadcast part join,
    ratio of two decimal-exact sums (deterministic double division)."""
    l = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1997-09-01"))
        & (F.col("l_shipdate") < _ts("1997-10-01"))
    )
    p = load(spark, sf_dir, "part")
    rev = _revenue_col()
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0.0))
    return (
        l.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            ((F.lit(100.0) * dsum(promo)) / dsum(rev)).alias("promo_revenue_pct")
        )
    )


# ---------------------------------------------------------------------------
# Q15 — top supplier via scalar-max subquery (no collect)
# ---------------------------------------------------------------------------


@register(
    "q15_top_supplier",
    oracle=f"""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no, {dsum_sql(_REVENUE)} AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate <  TIMESTAMP '1997-04-01'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    ORDER BY s_suppkey
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: quarter revenue per supplier, then keep the
    max. The scalar subquery is a broadcast of a 1-row aggregate
    cross-joined back — no driver-side collect, so the plan stays a
    single job at any scale. Max over decimal-exact doubles is
    order-independent, so the equality filter is portable."""
    l = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1997-01-01"))
        & (F.col("l_shipdate") < _ts("1997-04-01"))
    )
    s = load(spark, sf_dir, "supplier")
    revenue = (
        l.groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(dsum(_revenue_col()).alias("total_revenue"))
    )
    mx = revenue.agg(F.max("total_revenue").alias("mx"))
    return (
        s.join(revenue, F.col("s_suppkey") == F.col("supplier_no"))
        .join(F.broadcast(mx), F.col("total_revenue") == F.col("mx"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


# ---------------------------------------------------------------------------
# Q17 — correlated per-part average threshold, decorrelated
# ---------------------------------------------------------------------------


@register(
    "q17_small_quantity_revenue",
    oracle=f"""
    WITH part_avg AS (
      SELECT l_partkey AS pk,
             0.2 * ({dsum_sql("l_quantity")} / COUNT(*)) AS qty_threshold
      FROM lineitem GROUP BY l_partkey
    )
    SELECT {dsum_sql("l_extendedprice")} / 7.0 AS avg_yearly
    FROM lineitem
    JOIN part     ON p_partkey = l_partkey
    JOIN part_avg ON pk = l_partkey
    WHERE p_brand = 'Brand#23' AND p_size < 15
      AND l_quantity < qty_threshold
    """,
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape (p_container absent: brand+size filter). The
    correlated AVG subquery decorrelates into a groupBy on l_partkey
    joined back — at 100 TB that's one extra shuffle over the same key
    as the main join, and AQE turns the filtered side broadcast. The
    0.2*avg threshold uses the decimal-exact average so both engines
    compare against bit-identical doubles."""
    l = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").filter(
        (F.col("p_brand") == "Brand#23") & (F.col("p_size") < 15)
    )
    part_avg = l.groupBy(F.col("l_partkey").alias("pk")).agg(
        (F.lit(0.2) * (dsum(F.col("l_quantity")) / F.count("*"))).alias(
            "qty_threshold"
        )
    )
    return (
        l.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .join(part_avg, F.col("pk") == F.col("l_partkey"))
        .filter(F.col("l_quantity") < F.col("qty_threshold"))
        .agg((dsum(F.col("l_extendedprice")) / F.lit(7.0)).alias("avg_yearly"))
    )


# ---------------------------------------------------------------------------
# Q18 — large-volume orders (HAVING on a decimal sum, join back)
# ---------------------------------------------------------------------------


@register(
    "q18_large_volume_customers",
    oracle=f"""
    SELECT c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice,
           total_qty
    FROM (
      SELECT l_orderkey AS big_orderkey, {dsum_sql("l_quantity")} AS total_qty
      FROM lineitem GROUP BY l_orderkey
      HAVING SUM(CAST(l_quantity AS DECIMAL(30,6))) > 250
    )
    JOIN orders   ON o_orderkey = big_orderkey
    JOIN customer ON c_custkey = o_custkey
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 100
    """,
)
def q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: the IN-subquery with HAVING becomes a grouped
    filter joined back to orders/customer. HAVING compares the exact
    decimal sum (not the double), so the cut is bit-portable."""
    l = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    big = (
        l.groupBy(F.col("l_orderkey").alias("big_orderkey"))
        .agg(
            dsum(F.col("l_quantity")).alias("total_qty"),
            F.sum(F.col("l_quantity").cast("decimal(30,6)")).alias("_dec_qty"),
        )
        .filter(F.col("_dec_qty") > 250)
        .drop("_dec_qty")
    )
    return (
        big.join(o, F.col("o_orderkey") == F.col("big_orderkey"))
        .join(c, F.col("c_custkey") == F.col("o_custkey"))
        .select(
            "c_custkey", "c_name", "o_orderkey", "o_orderdate", "o_totalprice",
            "total_qty",
        )
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(100)
    )


# ---------------------------------------------------------------------------
# Q19 — disjunctive multi-band predicate join
# ---------------------------------------------------------------------------

_Q19_BANDS_SQL = """(
      (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
         AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
         AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
         AND l_quantity BETWEEN 20 AND 30)
)"""


@register(
    "q19_discounted_revenue",
    oracle=f"""
    SELECT {dsum_sql(_REVENUE)} AS revenue
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE {_Q19_BANDS_SQL}
    """,
)
def q19_discounted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: three OR'd (brand, size, quantity) bands.
    Catalyst extracts the common join key so this stays one broadcast
    hash join with the disjunction evaluated post-join; the p_brand IN
    superset could be pushed as a pre-filter on part at larger scale."""
    l = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").filter(
        F.col("p_brand").isin("Brand#12", "Brand#23", "Brand#34")
    )
    band = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 5)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 10)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#34")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return (
        l.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .filter(band)
        .agg(dsum(_revenue_col()).alias("revenue"))
    )


# ---------------------------------------------------------------------------
# Q20 — nested-IN via above-average grouped threshold (scale-free)
# ---------------------------------------------------------------------------


@register(
    "q20_potential_promotion",
    oracle=f"""
    WITH red_qty AS (
      SELECT l_suppkey, {dsum_sql("l_quantity")} AS supp_qty
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE p_name LIKE 'red%'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, supp_qty
    FROM supplier JOIN red_qty ON s_suppkey = l_suppkey
    WHERE supp_qty > (
      SELECT {dsum_sql("supp_qty")} / COUNT(*) FROM red_qty
    )
    ORDER BY s_suppkey
    """,
)
def q20_potential_promotion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape (partsupp-free): suppliers whose shipped
    quantity of red parts exceeds the cross-supplier average. The
    nested IN becomes groupBy -> scalar-avg broadcast -> filter ->
    join; the threshold is scale-free so the query stays selective at
    any SF. Averaging the (already decimal-exact) per-supplier sums
    goes through decimals again on both engines."""
    l = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").filter(F.col("p_name").like("red%"))
    s = load(spark, sf_dir, "supplier")
    red_qty = (
        l.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_suppkey")
        .agg(dsum(F.col("l_quantity")).alias("supp_qty"))
    )
    avg_qty = red_qty.agg(
        (dsum(F.col("supp_qty")) / F.count("*")).alias("avg_qty")
    )
    return (
        s.join(red_qty, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(avg_qty), F.col("supp_qty") > F.col("avg_qty"))
        .select("s_suppkey", "s_name", "supp_qty")
        .orderBy("s_suppkey")
    )


# ---------------------------------------------------------------------------
# Q21 — EXISTS + NOT EXISTS self-joins (semi/anti pair)
# ---------------------------------------------------------------------------


@register(
    "q21_waiting_suppliers",
    oracle=f"""
    SELECT s_name, {bigcount_sql()} AS numwait
    FROM supplier
    JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
    JOIN orders      ON o_orderkey = l1.l_orderkey
    WHERE o_orderstatus = 'F' AND l1.l_returnflag = 'R'
      AND EXISTS (
        SELECT 1 FROM lineitem l2
        WHERE l2.l_orderkey = l1.l_orderkey
          AND l2.l_suppkey <> l1.l_suppkey
      )
      AND NOT EXISTS (
        SELECT 1 FROM lineitem l3
        WHERE l3.l_orderkey = l1.l_orderkey
          AND l3.l_suppkey <> l1.l_suppkey
          AND l3.l_returnflag = 'R'
      )
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 25
    """,
)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (commitdate/receiptdate absent: returnflag 'R'
    marks the "late" lines). The EXISTS pair can't be plain semi/anti
    joins because the inner predicates reference l1.l_suppkey; instead
    both rewrite to per-order aggregates joined once on l_orderkey:
    - "another supplier exists" == order's distinct-supplier count > 1
    - "no other R supplier"     == order's R-supplier set == {{mine}},
      i.e. per-order R-line supplier min == max == l1.l_suppkey.
    One extra groupBy on the same key the main join shuffles on."""
    s = load(spark, sf_dir, "supplier")
    l = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    per_order = l.groupBy(F.col("l_orderkey").alias("ok")).agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.min(F.when(F.col("l_returnflag") == "R", F.col("l_suppkey"))).alias(
            "r_supp_min"
        ),
        F.max(F.when(F.col("l_returnflag") == "R", F.col("l_suppkey"))).alias(
            "r_supp_max"
        ),
    )
    l1 = l.filter(F.col("l_returnflag") == "R")
    return (
        l1.join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(per_order, F.col("ok") == F.col("l_orderkey"))
        .filter(
            (F.col("n_supp") > 1)
            & (F.col("r_supp_min") == F.col("l_suppkey"))
            & (F.col("r_supp_max") == F.col("l_suppkey"))
        )
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(25)
    )


# ---------------------------------------------------------------------------
# full outer join — period-over-period customer activity
# ---------------------------------------------------------------------------


@register(
    "join_full_outer_activity",
    oracle=f"""
    WITH a AS (
      SELECT o_custkey, {bigcount_sql()} AS n_1995 FROM orders
      WHERE o_orderdate >= TIMESTAMP '1995-01-01'
        AND o_orderdate <  TIMESTAMP '1996-01-01'
      GROUP BY o_custkey
    ),
    b AS (
      SELECT o_custkey, {bigcount_sql()} AS n_2000 FROM orders
      WHERE o_orderdate >= TIMESTAMP '2000-01-01'
        AND o_orderdate <  TIMESTAMP '2001-01-01'
      GROUP BY o_custkey
    )
    SELECT COALESCE(a.o_custkey, b.o_custkey) AS custkey,
           IFNULL(n_1995, 0) AS n_1995,
           IFNULL(n_2000, 0) AS n_2000
    FROM a FULL OUTER JOIN b ON a.o_custkey = b.o_custkey
    """,
)
def join_full_outer_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join (the one join type the rest of the catalog
    doesn't exercise): customers active in 1995 vs 2000 — either side
    can be null. Both inputs pre-aggregate on the join key, so the
    outer join shuffles two already-reduced relations."""
    o = load(spark, sf_dir, "orders")

    def year_counts(y: int, out: str) -> DataFrame:
        return (
            o.filter(
                (F.col("o_orderdate") >= _ts(f"{y}-01-01"))
                & (F.col("o_orderdate") < _ts(f"{y + 1}-01-01"))
            )
            .groupBy("o_custkey")
            .agg(F.count("*").alias(out))
        )

    a = year_counts(1995, "n_1995").withColumnRenamed("o_custkey", "ck_a")
    b = year_counts(2000, "n_2000").withColumnRenamed("o_custkey", "ck_b")
    return (
        a.join(b, F.col("ck_a") == F.col("ck_b"), "full_outer")
        .select(
            F.coalesce(F.col("ck_a"), F.col("ck_b")).alias("custkey"),
            F.ifnull(F.col("n_1995"), F.lit(0)).alias("n_1995"),
            F.ifnull(F.col("n_2000"), F.lit(0)).alias("n_2000"),
        )
    )


# ---------------------------------------------------------------------------
# unpivot — inverse of the pivot query (wide counts -> long)
# ---------------------------------------------------------------------------


@register(
    "unpivot_status_priority_counts",
    oracle=f"""
    WITH wide AS (
      SELECT o_orderstatus,
             {bigsum_sql("CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END")} AS URGENT,
             {bigsum_sql("CASE WHEN o_orderpriority = '2-HIGH' THEN 1 ELSE 0 END")} AS HIGH,
             {bigsum_sql("CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END")} AS OTHER
      FROM orders GROUP BY o_orderstatus
    )
    SELECT o_orderstatus, 'URGENT' AS priority_class, URGENT AS n_orders FROM wide
    UNION ALL
    SELECT o_orderstatus, 'HIGH', HIGH FROM wide
    UNION ALL
    SELECT o_orderstatus, 'OTHER', OTHER FROM wide
    """,
)
def unpivot_status_priority_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (melt): wide per-status priority counts back to long
    (status, priority_class, n_orders) rows — the inverse of
    pivot_priority_by_status. Narrow result; the wide input is an
    already-reduced aggregate, so unpivot is a projection (no shuffle)."""
    o = load(spark, sf_dir, "orders")
    urgent = F.when(F.col("o_orderpriority") == "1-URGENT", 1).otherwise(0)
    high = F.when(F.col("o_orderpriority") == "2-HIGH", 1).otherwise(0)
    other = F.when(
        ~F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1
    ).otherwise(0)
    wide = o.groupBy("o_orderstatus").agg(
        F.sum(urgent).alias("URGENT"),
        F.sum(high).alias("HIGH"),
        F.sum(other).alias("OTHER"),
    )
    return wide.unpivot(
        ["o_orderstatus"], ["URGENT", "HIGH", "OTHER"], "priority_class", "n_orders"
    )


# ---------------------------------------------------------------------------
# Q22 — anti-join + scalar-avg threshold over name-derived codes
# ---------------------------------------------------------------------------

_Q22_CODES = "('01','13','31','23','29','30','18')"


@register(
    "q22_global_sales_opportunity",
    oracle=f"""
    WITH eligible AS (
      SELECT substring(c_name, 17, 2) AS cntrycode, c_custkey, c_acctbal
      FROM customer
      WHERE substring(c_name, 17, 2) IN {_Q22_CODES}
    )
    SELECT cntrycode, {bigcount_sql()} AS numcust,
           {dsum_sql("c_acctbal")} AS totacctbal
    FROM eligible
    WHERE c_acctbal > (
        SELECT {dsum_sql("c_acctbal")} / COUNT(*)
        FROM eligible WHERE c_acctbal > 0.0
      )
      AND NOT EXISTS (
        SELECT 1 FROM orders
        WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT'
      )
    GROUP BY cntrycode
    ORDER BY cntrycode
    """,
)
def q22_global_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape (c_phone absent: the customer-number suffix in
    c_name is the "country code"; every fixture customer has orders, so
    the anti-join target is urgent orders instead of all orders).
    Anti-join shuffles on custkey; the scalar average broadcasts."""
    c = load(spark, sf_dir, "customer").withColumn(
        "cntrycode", F.substring("c_name", 17, 2)
    )
    eligible = c.filter(
        F.col("cntrycode").isin("01", "13", "31", "23", "29", "30", "18")
    )
    avg_bal = eligible.filter(F.col("c_acctbal") > 0.0).agg(
        (dsum(F.col("c_acctbal")) / F.count("*")).alias("avg_bal")
    )
    urgent = load(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return (
        eligible.join(F.broadcast(avg_bal), F.col("c_acctbal") > F.col("avg_bal"))
        .join(
            urgent,
            F.col("o_custkey") == F.col("c_custkey"),
            "left_anti",
        )
        .groupBy("cntrycode")
        .agg(
            F.count("*").alias("numcust"),
            dsum(F.col("c_acctbal")).alias("totacctbal"),
        )
        .orderBy("cntrycode")
    )
