"""Event-time operators (SURVEY.md §2.7 / Phase 3): tumbling, sliding
and session windows, plus exact stream dedup — batch-checkable twins of
the streaming versions in streaming/eventtime.py, over the ``events``
fixture (the reference has no event time at all; order.avsc carries no
timestamp — SURVEY.md §1.1).

Oracle notes:
- Spark's ``window()`` aligns to the epoch; DuckDB ``time_bucket`` with
  minute-granularity intervals aligns to 2000-01-03 00:00, which is
  epoch-congruent for divisors of a day, so the two agree for the
  window sizes used here.
- session windows: Spark merges events whose gaps are < gap; the SQL
  twin is the classic gaps-and-islands (lag + running flag-sum).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import bigcount_sql, dsum, dsum_sql, load, register

GAP = "2 hours"


@register(
    "tumbling_window_event_counts",
    oracle=f"""
    SELECT time_bucket(INTERVAL '5 minutes', ts) AS window_start,
           event_type,
           {bigcount_sql()} AS n_events,
           {dsum_sql("value")} AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
)
def tumbling_window_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 5-minute windows per event type (batch twin of the
    streaming windowed aggregation)."""
    e = load(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "5 minutes").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            dsum(F.col("value")).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


@register(
    "sliding_window_event_counts",
    oracle=f"""
    WITH starts AS (
      SELECT time_bucket(INTERVAL '5 minutes', ts) AS window_start, value FROM events
      UNION ALL
      SELECT time_bucket(INTERVAL '5 minutes', ts) - INTERVAL '5 minutes', value FROM events
    )
    SELECT window_start, {bigcount_sql()} AS n_events, {dsum_sql("value")} AS sum_value
    FROM starts
    GROUP BY 1
    """,
)
def sliding_window_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding windows: 10-minute width, 5-minute slide — every event
    falls in exactly two windows (the SQL twin materializes both
    assignments explicitly)."""
    e = load(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "10 minutes", "5 minutes").alias("w"))
        .agg(
            F.count("*").alias("n_events"),
            dsum(F.col("value")).alias("sum_value"),
        )
        .select(F.col("w.start").alias("window_start"), "n_events", "sum_value")
    )


@register(
    "session_window_user_sessions",
    oracle=f"""
    WITH flagged AS (
      SELECT user_id, ts,
             CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
                       > INTERVAL '{GAP}'
                  OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events
    ),
    sessions AS (
      SELECT user_id, ts,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS UNBOUNDED PRECEDING) AS session_id
      FROM flagged
    )
    SELECT user_id,
           MIN(ts) AS session_start,
           MAX(ts) + INTERVAL '{GAP}' AS session_end,
           {bigcount_sql()} AS n_events
    FROM sessions
    GROUP BY user_id, session_id
    """,
)
def session_window_user_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows with a 2-hour inactivity gap per user — Spark's
    session_window merges overlapping [ts, ts+gap) intervals; the oracle
    is the equivalent gaps-and-islands SQL."""
    e = load(spark, sf_dir, "events")
    return (
        e.groupBy(F.session_window("ts", GAP).alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )


@register(
    "dedup_events_exact",
    oracle=f"""
    SELECT user_id, event_type,
           MIN(event_id) AS first_event_id,
           {bigcount_sql()} AS n_duplicates
    FROM events
    GROUP BY user_id, event_type
    """,
)
def dedup_events_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup by business key (batch twin of streaming
    dropDuplicates/dropDuplicatesWithinWatermark): deterministic survivor
    (min event_id) — dropDuplicates' arbitrary-survivor semantics made
    reproducible."""
    e = load(spark, sf_dir, "events")
    return e.groupBy("user_id", "event_type").agg(
        F.min("event_id").alias("first_event_id"),
        F.count("*").alias("n_duplicates"),
    )
