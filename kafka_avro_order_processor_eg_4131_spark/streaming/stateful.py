"""Custom stateful streaming: the reference's in-memory accumulators
(message_count / order_count / total_price — consumer.py:137-145) as
*managed* state via applyInPandasWithState, emitting the running totals
after every micro-batch exactly as the reference prints them after
every message (batch-boundary granularity, SURVEY.md §2.5 A1-A3).

Unlike the reference's process-local variables (lost on restart,
SURVEY.md §1.5), this state lives in the state store and survives
failures with the checkpoint.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "group string, message_count long, order_count long, "
    "total_price double, running_average double"
)
STATE_SCHEMA = "message_count long, order_count long, total_price double"


def _update(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
    if state.exists:
        msg_n, ord_n, total = state.get
    else:
        msg_n, ord_n, total = 0, 0, 0.0
    for pdf in pdfs:
        msg_n += len(pdf)
        ok = pdf[pdf["status"] == "success"]
        ord_n += len(ok)
        total += float(ok["price"].sum())
    state.update((msg_n, ord_n, total))
    avg = total / ord_n if ord_n else None
    yield pd.DataFrame(
        [
            {
                "group": key[0],
                "message_count": msg_n,
                "order_count": ord_n,
                "total_price": total,
                "running_average": avg,
            }
        ]
    )


def running_order_stats(routed: DataFrame) -> DataFrame:
    """(status, price) stream -> one running-totals row per batch.

    The single logical accumulator group is keyed by a constant — at
    scale you key by tenant/partition instead; the operator shape is
    identical (this IS the degenerate one-key case the reference
    hardcodes)."""
    from pyspark.sql import functions as F

    keyed = routed.select(
        F.lit("global").alias("group"),
        F.col("status"),
        F.col("order.price").cast("double").alias("price"),
    )
    return keyed.groupBy("group").applyInPandasWithState(
        _update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
