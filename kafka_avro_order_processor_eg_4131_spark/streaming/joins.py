"""Streaming joins (engine surface beyond the reference, which has a
single stream and no second dataset — SURVEY.md §2.7):

- ``enrich_with_static``: stream-static join — each micro-batch joins
  the (broadcastable) dimension snapshot; no state required.
- ``stream_stream_within``: stream-stream inner join with watermarks on
  both sides and a time-bound join condition, so the state store can
  evict rows once the bound passes — the only way a stream-stream join
  is feasible at scale (unbounded state otherwise).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def enrich_with_static(stream: DataFrame, dim: DataFrame, on, how: str = "inner") -> DataFrame:
    """Stream-static enrichment; Spark broadcasts the static side per
    micro-batch (re-resolved each batch, so slowly-changing dims pick up
    updates on refresh)."""
    return stream.join(F.broadcast(dim), on, how)


def stream_stream_within(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    watermark: str = "10 minutes",
    within: str = "5 minutes",
    how: str = "inner",
) -> DataFrame:
    """Join of two streams on ``key`` where the right event happens
    within [left_ts, left_ts + within). Both sides watermarked so join
    state is bounded by watermark + within.

    ``how="leftOuter"`` additionally emits unmatched left rows
    (right columns null) — but only once the watermark passes the row's
    join bound, because until then a matching right row could still
    arrive; the time-bound condition is what makes that decidable."""
    l = left.withWatermark(left_ts, watermark).alias("l")
    r = right.withWatermark(right_ts, watermark).alias("r")
    cond = (
        (F.col(f"l.{key}") == F.col(f"r.{key}"))
        & (F.col(f"r.{right_ts}") >= F.col(f"l.{left_ts}"))
        & (F.col(f"r.{right_ts}") < F.col(f"l.{left_ts}") + F.expr(f"INTERVAL {within}"))
    )
    return l.join(r, cond, how)
