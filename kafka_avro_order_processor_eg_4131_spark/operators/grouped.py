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
        pdf = pdf.sort_values(["o_orderdate", "o_orderkey"])
        gaps = pdf["o_orderdate"].diff().dt.total_seconds().dropna() / 86400.0
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
