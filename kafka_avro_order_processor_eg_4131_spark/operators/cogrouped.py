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


def _merge_asof_bucket(le: pd.DataFrame, ri: pd.DataFrame) -> pd.DataFrame:
    # NULL-time rows mirror the SQL ASOF semantics pandas would other-
    # wise raise on ("Merge keys contain null values", round-8 edge-
    # relational probe): `ts >= o_orderdate` is never true against a
    # NULL, so null-dated orders can never match anyone (drop from the
    # right) and null-ts events emit unmatched (left join keeps them
    # with NULL payload).
    le = le.sort_values("ts", kind="mergesort").reset_index(drop=True)
    out = pd.DataFrame(
        {
            "event_id": le["event_id"].astype("int64"),
            "user_id": le["user_id"].astype("int64"),
            "ts": le["ts"],
        }
    )
    ri = ri[ri["o_orderdate"].notna()]
    ok = le["ts"].notna()
    lk = pd.array([None] * len(le), dtype="Int64")
    ds = pd.array([None] * len(le), dtype="Int64")
    if not ri.empty and ok.any():
        ri = ri.sort_values("o_orderdate", kind="mergesort").reset_index(drop=True)
        m = pd.merge_asof(
            le.loc[ok].reset_index(drop=True),
            ri,
            left_on="ts",
            right_on="o_orderdate",
            by="user_id",  # per-user matching INSIDE one vectorized call
            direction="backward",  # latest order with o_orderdate <= ts
        )
        # exact floor of the elapsed days (microsecond integer division
        # — mirrors the oracle's date_diff('microsecond')//86400e6)
        delta = m["ts"] - m["o_orderdate"]
        days = delta // pd.Timedelta(microseconds=1) // _DAY_US
        idx = ok.to_numpy().nonzero()[0]
        lk[idx] = pd.array(m["o_orderkey"].astype("Int64"))
        ds[idx] = pd.array(days.astype("Int64"))
    out["last_orderkey"] = lk
    out["days_since_order"] = ds
    return out


N_BUCKETS = 32


def cogrouped_asof_orders(events: DataFrame, orders_dedup: DataFrame) -> DataFrame:
    """events x orders via cogrouped applyInPandas merge_asof.
    ``orders_dedup`` must be one row per (user_id, o_orderdate) — same
    precondition as the JVM as-of operator.

    The cogroup key is a BUCKET of users (user_id % 32), not the user:
    pandas' per-call overhead dominates with thousands of tiny keys
    (measured 26 s -> ~2 s at sf0.1), and ``merge_asof(by="user_id")``
    does the per-user matching vectorized inside each bucket — the
    few-large-groups shape every grouped-map UDF wants. Parallelism is
    bucket-wide; at 100 TB raise N_BUCKETS to ~2-3x cluster cores."""
    from pyspark.sql import functions as F

    from ..shipping import ship_package

    ship_package(events.sparkSession)
    eb = events.withColumn("__b", F.pmod(F.col("user_id"), F.lit(N_BUCKETS)))
    ob = orders_dedup.withColumn("__b", F.pmod(F.col("user_id"), F.lit(N_BUCKETS)))
    return (
        eb.groupBy("__b")
        .cogroup(ob.groupBy("__b"))
        .applyInPandas(_merge_asof_bucket, ASOF_OUT_SCHEMA)
    )
