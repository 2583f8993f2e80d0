"""Grouped custom aggregation via applyInPandas (the UDAF/grouped-map
surface, SURVEY.md §2.7): arbitrary per-group pandas logic with
Arrow-batched transfer — the escape hatch for semantics Spark's
built-in aggregates can't express.

Used sparingly by design: the example below (per-customer order-gap
statistics) is checkable against a pure window-function formulation in
tests, demonstrating when NOT to reach for Python (the built-in path
wins) while proving the plumbing for when you must.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame

GAP_STATS_SCHEMA = (
    "o_custkey long, n_orders long, mean_gap_days double, max_gap_days double"
)


def order_gap_stats(orders: DataFrame) -> DataFrame:
    """Per-customer statistics over the gaps between consecutive orders."""

    def _stats(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["o_orderdate", "o_orderkey"])
        gaps = pdf["o_orderdate"].diff().dt.total_seconds().dropna() / 86400.0
        return pd.DataFrame(
            [
                {
                    "o_custkey": int(pdf["o_custkey"].iloc[0]),
                    "n_orders": len(pdf),
                    "mean_gap_days": float(gaps.mean()) if len(gaps) else float("nan"),
                    "max_gap_days": float(gaps.max()) if len(gaps) else float("nan"),
                }
            ]
        )

    return (
        orders.select("o_custkey", "o_orderkey", "o_orderdate")
        .groupBy("o_custkey")
        .applyInPandas(_stats, GAP_STATS_SCHEMA)
    )
