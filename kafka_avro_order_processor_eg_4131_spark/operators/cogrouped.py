"""Cogrouped-pandas operator surface: ``groupBy().cogroup().applyInPandas``
— the two-sided Arrow UDF API (SURVEY.md §2.7 UDF/UDAF/UDTF row). The
demonstration kernel is the pandas ``merge_asof``: each key's event and
order partitions meet in one pandas callback, which is exactly how a
data scientist's single-node merge_asof logic lifts onto the cluster —
Spark shuffles both sides by key, the Python function only ever sees
one key's slice.

Scale shape: one co-shuffle on the key for each side, then
embarrassingly parallel per-key pandas work; per-task memory is the
largest single key's rows (same bound as any grouped-map UDF). The
JVM-native union-sort as-of join (operators/joins.py) is the
whole-column fast path; this operator exists for logic that genuinely
needs pandas inside the key (model scoring, stateful per-key python).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame

ASOF_OUT_SCHEMA = (
    "event_id long, user_id long, ts timestamp_ntz, "
    "last_orderkey long, days_since_order long"
)

_DAY_US = 86_400_000_000


def _merge_asof_key(le: pd.DataFrame, ri: pd.DataFrame) -> pd.DataFrame:
    le = le.sort_values("ts")
    out = pd.DataFrame(
        {
            "event_id": le["event_id"].astype("int64"),
            "user_id": le["user_id"].astype("int64"),
            "ts": le["ts"],
        }
    )
    if ri.empty:
        out["last_orderkey"] = pd.array([None] * len(le), dtype="Int64")
        out["days_since_order"] = pd.array([None] * len(le), dtype="Int64")
        return out
    ri = ri.sort_values("o_orderdate")
    m = pd.merge_asof(
        le.reset_index(drop=True),
        ri.reset_index(drop=True),
        left_on="ts",
        right_on="o_orderdate",
        direction="backward",  # latest order with o_orderdate <= ts
    )
    out = out.reset_index(drop=True)
    out["last_orderkey"] = m["o_orderkey"].astype("Int64")
    # exact floor of the elapsed days (microsecond integer division —
    # mirrors the oracle's date_diff('microsecond')//86400e6)
    delta = m["ts"] - m["o_orderdate"]
    days = delta // pd.Timedelta(microseconds=1) // _DAY_US
    out["days_since_order"] = days.astype("Int64")
    return out


def cogrouped_asof_orders(events: DataFrame, orders_dedup: DataFrame) -> DataFrame:
    """events x orders per user via cogrouped applyInPandas merge_asof.
    ``orders_dedup`` must be one row per (user_id, o_orderdate) — same
    precondition as the JVM as-of operator."""
    from ..shipping import ship_package

    ship_package(events.sparkSession)
    return (
        events.groupBy("user_id")
        .cogroup(orders_dedup.groupBy("user_id"))
        .applyInPandas(_merge_asof_key, ASOF_OUT_SCHEMA)
    )
