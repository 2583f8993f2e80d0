"""Grouped custom aggregation via applyInPandas (the UDAF/grouped-map
surface, SURVEY.md §2.7): arbitrary per-group pandas logic with
Arrow-batched transfer — the escape hatch for semantics Spark's
built-in aggregates can't express.

Group-shape guidance (measured): applyInPandas pays per-group pandas
overhead, so it fits FEW LARGE groups (here: 15 status x priority
segments over all orders). Keying it by a high-cardinality column
(100k customers) cost 28 s where the built-in window formulation takes
under a second — that anti-pattern is exactly why the test suite pins
this operator against its window-function twin.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame

GAP_STATS_SCHEMA = (
    "o_orderstatus string, o_orderpriority string, n_orders long, "
    "mean_gap_days double, max_gap_days double"
)


def order_gap_stats(orders: DataFrame) -> DataFrame:
    """Per-(status, priority) statistics over gaps between consecutive
    orders in the segment (ordered by date, then key)."""

    def _stats(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        pdf = pdf.sort_values(["o_orderdate", "o_orderkey"])
        # gaps via INTEGER epoch-seconds, not pandas datetime diff: a
        # segment spanning 1700..2200 (round-10 combined-edge fixture)
        # has a ~1.6e19 ns delta that overflows pandas' int64 ns
        # arithmetic (OverflowError), while the same delta is a safe
        # ~1.6e10 in seconds. NaT rows sort last and are dropped, so
        # diffs run between consecutive valid dates — exactly the rows
        # the oracle's LAG produces non-NULL date_diff for. The ns->s
        # unit cast is exact on the date-aligned timestamps this
        # operator ingests (and the day division below already assumes
        # that alignment for float portability).
        valid = pdf["o_orderdate"].dropna().to_numpy()
        secs = valid.astype("datetime64[s]").astype("int64")
        gaps = np.diff(secs) / 86400.0
        return pd.DataFrame(
            [
                {
                    "o_orderstatus": pdf["o_orderstatus"].iloc[0],
                    "o_orderpriority": pdf["o_orderpriority"].iloc[0],
                    "n_orders": len(pdf),
                    "mean_gap_days": float(gaps.mean()) if len(gaps) else float("nan"),
                    "max_gap_days": float(gaps.max()) if len(gaps) else float("nan"),
                }
            ]
        )

    return (
        orders.select("o_orderstatus", "o_orderpriority", "o_orderkey", "o_orderdate")
        .groupBy("o_orderstatus", "o_orderpriority")
        .applyInPandas(_stats, GAP_STATS_SCHEMA)
    )


# ---------------------------------------------------------------------------
# Incremental aggregate maintenance (the materialized-view merge kernel)
# ---------------------------------------------------------------------------

_MV_DEC = "decimal(30,6)"


def partial_order_stats(orders: DataFrame, group_col: str = "o_orderstatus") -> DataFrame:
    """Mergeable partial aggregate over one slice of the fact table:
    (group, n, exact decimal sum). This is the state a warehouse stores
    per partition/day so refreshing a rollup only touches NEW slices —
    counts and decimal sums are associative and exact, so any merge
    order reproduces the full recompute bit-for-bit (doubles would
    not: their sums drift with add order, which is why the partial
    carries the decimal)."""
    from pyspark.sql import functions as F

    return orders.groupBy(group_col).agg(
        F.count("*").alias("n"),
        F.sum(F.col("o_totalprice").cast(_MV_DEC)).alias("sum_dec"),
    )


def merge_order_stats(*partials: DataFrame) -> DataFrame:
    """Merge any number of partial relations into the final rollup
    (group, n_orders, total_price, avg_price) — equal to aggregating
    all underlying rows directly. union + re-aggregate: the merge cost
    scales with GROUP COUNT x slice count, never with fact rows, which
    is the entire point of incremental maintenance at 100 TB."""
    from functools import reduce

    from pyspark.sql import functions as F

    u = reduce(DataFrame.unionByName, partials)
    group_col = [c for c in u.columns if c not in ("n", "sum_dec")][0]
    return u.groupBy(group_col).agg(
        F.sum("n").alias("n_orders"),
        F.sum("sum_dec").cast("string").cast("double").alias("total_price"),
        (F.sum("sum_dec").cast("string").cast("double") / F.sum("n")).alias(
            "avg_price"
        ),
    )
