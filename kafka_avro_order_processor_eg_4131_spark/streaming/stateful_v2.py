"""The reference's running accumulators on Spark 4's NEW stateful API
(``transformWithStateInPandas``, SPARK-49560) — the successor to
``applyInPandasWithState`` used in stateful.py. Same semantics
(consumer.py:137-145's message/order counters and running total,
emitted once per micro-batch), different state contract:

- state is a named ``ValueState`` fetched from a ``StatefulProcessorHandle``
  (composable: a processor can hold several named states, list/map state,
  timers — none of which the old API offers);
- lifecycle is explicit (``init`` / ``handleInputRows`` / ``close``).

ENVIRONMENT GATE: the TransformWithState protocol serializes state
over a protobuf socket (pyspark/sql/streaming/proto/StateMessage_pb2),
and ``google.protobuf`` is not installed in this container — so like
the Kafka source (sources/kafka.py), this operator is code-complete
but can only execute where protobuf is present. ``twsip_available()``
is the gate; tests skip on it and assert the exact failure mode
otherwise. The applyInPandasWithState twin (stateful.py) carries the
executable coverage of the same semantics.

One deliberate improvement over the v1 twin: the running total is kept
as EXACT integER CENTS in state (floor(price*100+0.5), the
gini/catalog discipline) instead of a float accumulator, so the
emitted totals are identical regardless of how rows batch — the
float-sum drift applyInPandasWithState inherits from per-batch
``sum()`` order simply cannot occur. The reference itself accumulates
Python floats (consumer.py:141) and would drift at scale.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.stateful_processor import StatefulProcessor

OUTPUT_SCHEMA = (
    "group string, message_count long, order_count long, "
    "total_price double, running_average double"
)
_STATE_SCHEMA = "message_count long, order_count long, total_cents long"


def twsip_available() -> bool:
    """True when the TransformWithState python runtime can start: the
    state-server protocol needs google.protobuf, absent here."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except Exception:
        return False


class RunningOrderStatsProcessor(StatefulProcessor):
    """StatefulProcessor maintaining (messages, success orders, exact
    cents) per key. Module-level class: the processor is pickled to the
    Python worker, so it must be importable by qualified name (a
    dynamically built class crashes the TransformWithState worker)."""

    def init(self, handle) -> None:
        self._totals = handle.getValueState("totals", _STATE_SCHEMA)

    def handleInputRows(self, key, rows: Iterator[pd.DataFrame], timerValues):
        if self._totals.exists():
            msg_n, ord_n, cents = self._totals.get()
        else:
            msg_n, ord_n, cents = 0, 0, 0
        for pdf in rows:
            msg_n += len(pdf)
            ok = pdf[pdf["status"] == "success"]
            ord_n += len(ok)
            # exact integer cents; floor(x*100+0.5) recovers 2-dp values
            cents += int((ok["price"] * 100.0 + 0.5).astype("int64").sum())
        self._totals.update((msg_n, ord_n, cents))
        total = cents / 100.0
        yield pd.DataFrame(
            [
                {
                    "group": key[0],
                    "message_count": msg_n,
                    "order_count": ord_n,
                    "total_price": total,
                    "running_average": (total / ord_n) if ord_n else None,
                }
            ]
        )

    def close(self) -> None:
        pass


def running_order_stats_v2(routed: DataFrame) -> DataFrame:
    """(status, price) stream -> one running-totals row per batch, via
    transformWithStateInPandas. Keyed by a constant like the reference's
    single global accumulator; at scale the key becomes tenant/topic
    partition and the processor is unchanged."""
    from pyspark.sql import functions as F

    from ..shipping import ship_package

    # the processor pickle references this module by qualified name; the
    # TransformWithState driver worker resolves it via the shipped zip
    ship_package(routed.sparkSession)
    keyed = routed.select(
        F.lit("global").alias("group"),
        F.col("status"),
        F.col("price").cast("double").alias("price"),
    )
    return keyed.groupBy("group").transformWithStateInPandas(
        statefulProcessor=RunningOrderStatsProcessor(),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
