"""Event-time streaming operators (Phase 3): watermarked tumbling /
sliding / session windows and stream dedup. The reference has no event
time (SURVEY.md §1.1); these are the driver-mandated extensions, built
entirely from Structured Streaming primitives.

Each function takes a *streaming* DataFrame with an event-time column
and returns the transformed streaming DataFrame — source/sink wiring
stays with the caller so the same logic runs behind Kafka, file, or
rate sources. Batch twins with DuckDB oracles live in plans/timeops.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_WATERMARK = "10 minutes"


def tumbling_counts(
    events: DataFrame,
    window: str = "5 minutes",
    watermark: str = DEFAULT_WATERMARK,
    ts_col: str = "ts",
) -> DataFrame:
    """Watermarked tumbling-window counts per event type. Late rows beyond
    the watermark are dropped; state for closed windows is evicted."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window).alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events")
    )


def sliding_counts(
    events: DataFrame,
    window: str = "10 minutes",
    slide: str = "5 minutes",
    watermark: str = DEFAULT_WATERMARK,
    ts_col: str = "ts",
) -> DataFrame:
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window, slide).alias("w"))
        .agg(F.count("*").alias("n_events"))
        .select(F.col("w.start").alias("window_start"), "n_events")
    )


def session_counts(
    events: DataFrame,
    gap: str = "2 hours",
    watermark: str = DEFAULT_WATERMARK,
    ts_col: str = "ts",
) -> DataFrame:
    """Session windows: state merges as events arrive, closes once the
    watermark passes session_end + gap."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(ts_col, gap).alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )


def dedup_within_watermark(
    events: DataFrame,
    keys: list[str],
    watermark: str = DEFAULT_WATERMARK,
    ts_col: str = "ts",
) -> DataFrame:
    """Streaming dedup bounded by the watermark — state is evicted once
    duplicates can no longer arrive (vs unbounded dropDuplicates state)."""
    return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(keys)
