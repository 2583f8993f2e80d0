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

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import (
    bigcount_sql,
    bigsum_sql,
    cents,
    cents_sql,
    dsum,
    dsum_sql,
    is_finite,
    load,
    pctile_sql,
    register,
)

GAP = "2 hours"


@register(
    "tumbling_window_event_counts",
    oracle=f"""
    SELECT time_bucket(INTERVAL '5 minutes', ts) AS window_start,
           event_type,
           {bigcount_sql()} AS n_events,
           {dsum_sql("value")} AS sum_value
    FROM events
    WHERE ts IS NOT NULL
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
      SELECT time_bucket(INTERVAL '5 minutes', ts) AS window_start, value
      FROM events WHERE ts IS NOT NULL
      UNION ALL
      SELECT time_bucket(INTERVAL '5 minutes', ts) - INTERVAL '5 minutes', value
      FROM events WHERE ts IS NOT NULL
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
      -- event_id tiebreak in BOTH windows (round-10 combined-edge
      -- probe): duplicate (user, ts) rows under an ORDER BY ts alone
      -- let the LAG window and the running-SUM window visit the tied
      -- rows in DIFFERENT orders (DuckDB evaluates them separately,
      -- in parallel), nondeterministically splitting one session into
      -- two — the new_session=1 row could sum AFTER the =0 row
      SELECT user_id, ts, event_id,
             CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id
                                          ORDER BY ts, event_id)
                       > INTERVAL '{GAP}'
                  OR LAG(ts) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events WHERE ts IS NOT NULL
    ),
    sessions AS (
      SELECT user_id, ts,
             SUM(new_session) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id
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


@register(
    "cohort_weekly_retention",
    oracle=f"""
    WITH first_seen AS (
      SELECT user_id, date_trunc('week', MIN(ts)) AS cohort_week
      FROM events GROUP BY user_id
    ),
    activity AS (
      SELECT DISTINCT user_id, date_trunc('week', ts) AS activity_week
      FROM events
    )
    SELECT f.cohort_week,
           CAST(date_diff('day', f.cohort_week, a.activity_week) // 7 AS INT)
             AS week_offset,
           CAST(COUNT(DISTINCT a.user_id) AS BIGINT) AS n_users
    FROM first_seen f JOIN activity a ON a.user_id = f.user_id
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
)
def cohort_weekly_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users bucketed by first-seen week, then
    distinct active users per (cohort, weeks-since-cohort) — the
    standard product-analytics shape. Two aggregates over the same
    user_id shuffle key plus one broadcast-able join (first_seen is one
    row per user, far smaller than events)."""
    e = load(spark, sf_dir, "events")
    first_seen = e.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    activity = e.select(
        "user_id", F.date_trunc("week", F.col("ts")).alias("activity_week")
    ).distinct()
    return (
        first_seen.join(activity, "user_id")
        .groupBy(
            "cohort_week",
            F.floor(
                F.datediff(F.col("activity_week"), F.col("cohort_week")) / 7
            ).cast("int").alias("week_offset"),
        )
        .agg(F.count_distinct("user_id").alias("n_users"))
        .orderBy("cohort_week", "week_offset")
    )


@register(
    "timeseries_dense_daily_counts",
    oracle="""
    WITH bounds AS (
      SELECT date_trunc('day', MIN(ts)) AS d0, date_trunc('day', MAX(ts)) AS d1
      FROM events WHERE event_type = 'purchase'
    ),
    spine AS (
      SELECT unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS day FROM bounds
    ),
    actual AS (
      SELECT date_trunc('day', ts) AS day, CAST(COUNT(*) AS BIGINT) AS n
      FROM events WHERE event_type = 'purchase' GROUP BY 1
    )
    SELECT s.day, COALESCE(a.n, 0) AS n_purchases
    FROM spine s LEFT JOIN actual a ON a.day = s.day
    ORDER BY s.day
    """,
)
def timeseries_dense_daily_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-filled daily counts (dense time series): a generated date
    spine LEFT-joined to the actual per-day aggregate, zeros where no
    events landed — the standard resample-with-fill shape. The spine is
    F.sequence over the min/max bounds (one-row aggregate, exploded),
    so no driver-side date arithmetic; at scale the spine is tiny and
    broadcast while the aggregate side carries the data."""
    e = load(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    bounds = e.agg(
        F.date_trunc("day", F.min("ts")).alias("d0"),
        F.date_trunc("day", F.max("ts")).alias("d1"),
    )
    spine = bounds.select(
        F.explode(
            F.sequence(F.col("d0"), F.col("d1"), F.expr("INTERVAL 1 DAY"))
        ).alias("day")
    )
    actual = (
        e.groupBy(F.date_trunc("day", F.col("ts")).alias("day"))
        .agg(F.count("*").alias("n"))
    )
    return (
        spine.join(actual, "day", "left")
        .select("day", F.coalesce(F.col("n"), F.lit(0)).alias("n_purchases"))
        .orderBy("day")
    )


# bucketed range self-join: pairs of events from the same user within
# this window of each other
_PAIR_WINDOW_MICROS = 300_000_000  # 5 minutes


@register(
    "range_join_user_event_pairs",
    oracle=f"""
    SELECT a.event_id AS id1, b.event_id AS id2,
           CAST(date_diff('microsecond', a.ts, b.ts) AS BIGINT) AS gap_micros
    FROM events a JOIN events b
      ON a.user_id = b.user_id
     AND b.ts > a.ts
     AND b.ts <= a.ts + INTERVAL 5 MINUTE
    """,
)
def range_join_user_event_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (interval) self-join, bucketed for scale: pairs of events
    by the same user at most 5 minutes apart. A naive theta join is
    O(per-user-events^2) with no equi-key for the time axis; bucketing
    timestamps into window-sized cells and exploding the left side to
    (cell, cell+1) makes it an EQUI-join on (user_id, bucket) — each
    pair meets in exactly one bucket (the right row's own cell), so no
    distinct pass is needed. The residual range predicate then filters
    within buckets. Shuffle volume is 2x events, never the cross
    product; this is the standard interval-join kernel (Flink/KDB asof
    cousins) expressed in pure DataFrame ops."""
    # ts is TIMESTAMP_NTZ; timestampdiff from a fixed NTZ epoch gives
    # monotonic microseconds independent of the session timezone
    e = load(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        F.expr(
            "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '2024-01-01 00:00:00', ts)"
        ).alias("t"),
    )
    w = _PAIR_WINDOW_MICROS
    cell = F.expr(f"t div {w}")
    left = e.select(
        F.col("user_id"),
        F.col("event_id").alias("id1"),
        F.col("t").alias("t1"),
        F.explode(F.array(cell, cell + 1)).alias("bucket"),
    )
    right = e.select(
        F.col("user_id"),
        F.col("event_id").alias("id2"),
        F.col("t").alias("t2"),
        cell.alias("bucket"),
    )
    return (
        left.join(right, ["user_id", "bucket"])
        .filter((F.col("t2") > F.col("t1")) & (F.col("t2") <= F.col("t1") + w))
        .select("id1", "id2", (F.col("t2") - F.col("t1")).alias("gap_micros"))
    )


@register(
    "events_anomaly_zscore",
    oracle="""
    WITH s0 AS (
      -- moment domain |x| < 1e14, like agg_variance_exact (round-9)
      SELECT event_type,
             COUNT(CASE WHEN isnan(value) THEN 1 END) AS q_nan,
             COUNT(CASE WHEN NOT isnan(value) AND value >= 1e14 THEN 1 END)
               AS q_pinf,
             COUNT(CASE WHEN value <= -1e14 THEN 1 END) AS q_ninf,
             CAST(CAST(SUM(CAST(CASE WHEN NOT isnan(value) AND value > -1e14
                                      AND value < 1e14 THEN value END
                                AS DECIMAL(19,4))) AS VARCHAR) AS DOUBLE) AS sxf,
             CAST(CAST(SUM(CAST(CASE WHEN NOT isnan(value) AND value > -1e14
                                      AND value < 1e14 THEN value END
                                AS DECIMAL(19,4))
                         * CAST(CASE WHEN NOT isnan(value) AND value > -1e14
                                      AND value < 1e14 THEN value END
                                AS DECIMAL(19,4))) AS VARCHAR) AS DOUBLE) AS sxxf,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY event_type
    ), s AS (
      -- IEEE moment propagation (round-9 float-edge probe): any NaN (or
      -- +Inf with -Inf) poisons sx to NaN; squares make any Inf a +Inf
      -- in sxx; downstream double arithmetic then propagates in both
      -- engines identically
      SELECT event_type, n,
             CASE WHEN q_nan > 0 OR (q_pinf > 0 AND q_ninf > 0)
                  THEN 'nan'::DOUBLE
                  WHEN q_pinf > 0 THEN 'infinity'::DOUBLE
                  WHEN q_ninf > 0 THEN '-infinity'::DOUBLE
                  ELSE sxf END AS sx,
             CASE WHEN q_nan > 0 THEN 'nan'::DOUBLE
                  WHEN q_pinf > 0 OR q_ninf > 0 THEN 'infinity'::DOUBLE
                  ELSE sxxf END AS sxx
      FROM s0
    ), st AS (
      SELECT event_type,
             (sx / n) AS mean_v,
             sqrt((sxx - sx * sx / n) / (n - 1)) AS std_v
      FROM s
    )
    SELECT e.event_id, e.event_type, e.value,
           ((e.value - st.mean_v) / st.std_v) AS z
    FROM events e JOIN st ON st.event_type = e.event_type
    WHERE abs((e.value - st.mean_v) / st.std_v) >= 3.0
    """,
)
def events_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-pass anomaly flagging: per-type mean/std from exact decimal
    sums (agg_variance_exact discipline), broadcast back onto the event
    stream, keep |z| >= 3. The stats side is a handful of rows at any
    scale, so the second pass is a map-side broadcast probe — the whole
    operator is one shuffle (the stats aggregate) + one scan."""
    e = load(spark, sf_dir, "events")
    v = F.col("value")
    in_dom = ~F.isnan(v) & (v > F.lit(-1e14)) & (v < F.lit(1e14))
    xd = F.when(in_dom, v).cast("decimal(18,4)")
    q_nan = F.count(F.when(F.isnan(v), F.lit(1)))
    q_pinf = F.count(F.when(~F.isnan(v) & (v >= F.lit(1e14)), F.lit(1)))
    q_ninf = F.count(F.when(v <= F.lit(-1e14), F.lit(1)))
    NAN, PINF, NINF = (F.lit(float(x)) for x in ("nan", "inf", "-inf"))
    s = e.groupBy("event_type").agg(
        # IEEE moment propagation — see the oracle comment
        F.when((q_nan > 0) | ((q_pinf > 0) & (q_ninf > 0)), NAN)
        .when(q_pinf > 0, PINF)
        .when(q_ninf > 0, NINF)
        .otherwise(F.sum(xd).cast("string").cast("double"))
        .alias("sx"),
        F.when(q_nan > 0, NAN)
        .when((q_pinf > 0) | (q_ninf > 0), PINF)
        .otherwise(F.sum(xd * xd).cast("string").cast("double"))
        .alias("sxx"),
        F.count("*").alias("n"),
    )
    # try_divide: a single-event type has n-1 = 0 and a constant-value
    # type has std 0 — DuckDB float /0 is NULL (z NULL -> filtered),
    # ANSI Spark raises (round-8 time-edge probe)
    st = s.select(
        "event_type",
        (F.col("sx") / F.col("n")).alias("mean_v"),
        F.sqrt(
            F.try_divide(
                F.col("sxx") - F.col("sx") * F.col("sx") / F.col("n"),
                F.col("n") - 1,
            )
        ).alias("std_v"),
    )
    z = F.try_divide(F.col("value") - F.col("mean_v"), F.col("std_v"))
    return (
        e.join(F.broadcast(st), "event_type")
        .filter(F.abs(z) >= 3.0)
        .select("event_id", "event_type", "value", z.alias("z"))
    )


# event-path mining: first N event types per session, top paths
_PATH_LEN = 5
_PATH_TOP = 20


@register(
    "session_event_paths",
    oracle=f"""
    WITH flagged AS (
      SELECT user_id, ts, event_id, event_type,
             CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts NULLS LAST, event_id)
                       > INTERVAL '{GAP}'
                  OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts NULLS LAST, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events
    ),
    sessions AS (
      SELECT user_id, ts, event_id, event_type,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts NULLS LAST, event_id
                                    ROWS UNBOUNDED PRECEDING) AS session_id
      FROM flagged
    ),
    paths AS (
      SELECT user_id, session_id,
             array_to_string(
               list_slice(list(event_type ORDER BY ts NULLS LAST, event_id), 1, {_PATH_LEN}),
               '>') AS path
      FROM sessions GROUP BY user_id, session_id
    )
    SELECT path, {bigcount_sql()} AS n_sessions
    FROM paths GROUP BY path
    ORDER BY n_sessions DESC, path
    LIMIT {_PATH_TOP}
    """,
)
def session_event_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session path mining: sessionize per user (2 h inactivity gap,
    gaps-and-islands — both windows partition by user, so no global
    sort), take each session's first 5 event types in time order as the
    path string, and count the corpus-wide top-20 paths. The final
    top-k is TakeOrdered (no global sort); (ts, event_id) ordering
    makes the survivor path deterministic under timestamp ties."""
    from pyspark.sql import Window

    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc_nulls_last(), "event_id")
    lag_ts = F.lag("ts").over(w)
    new_session = (
        lag_ts.isNull()
        | ((F.col("ts") - lag_ts) > F.expr(f"INTERVAL '{GAP}'"))
    ).cast("int")
    sess = (
        e.select("user_id", "ts", "event_id", "event_type")
        .withColumn("new_session", new_session)
        .withColumn(
            "session_id",
            F.sum("new_session").over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
    )
    # the in-array sort key maps a NULL ts to +inf (Long.MAX micros):
    # Spark's struct comparison sorts a null field FIRST while the
    # oracle's list(... ORDER BY ts NULLS LAST ...) sorts it last — the
    # coalesce makes both engines put timestamp-less events at the
    # path's tail (round-8 time-edge probe)
    ts_key = F.coalesce(
        F.unix_micros(F.col("ts").cast("timestamp")),
        F.lit(9223372036854775807),
    )
    paths = sess.groupBy("user_id", "session_id").agg(
        F.concat_ws(
            ">",
            F.slice(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.struct(
                                ts_key.alias("tsk"), "event_id", "event_type"
                            )
                        )
                    ),
                    lambda s: s.event_type,
                ),
                1,
                _PATH_LEN,
            ),
        ).alias("path")
    )
    return (
        paths.groupBy("path")
        .agg(F.count("*").alias("n_sessions"))
        .orderBy(F.col("n_sessions").desc(), "path")
        .limit(_PATH_TOP)
    )


@register(
    "timeseries_daily_ohlc",
    oracle=f"""
    WITH r AS (
      SELECT date_trunc('day', ts) AS day, value,
             ROW_NUMBER() OVER (PARTITION BY date_trunc('day', ts)
                                ORDER BY ts NULLS LAST, event_id) AS rn_a,
             ROW_NUMBER() OVER (PARTITION BY date_trunc('day', ts)
                                ORDER BY ts DESC, event_id DESC) AS rn_d
      FROM events
    )
    SELECT day,
           MAX(CASE WHEN rn_a = 1 THEN value END) AS open_v,
           MAX(value) AS high_v,
           MIN(value) AS low_v,
           MAX(CASE WHEN rn_d = 1 THEN value END) AS close_v,
           {bigcount_sql()} AS n_events
    FROM r GROUP BY day
    """,
)
def timeseries_daily_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily OHLC bars over the event stream: open/close via
    MIN_BY/MAX_BY on a (ts, event_id) struct key (deterministic under
    timestamp ties), high/low as plain MIN/MAX — one hash aggregate,
    no window, no sort. The oracle takes the row-number route because
    DuckDB's arg_min has no composite-key overload; both compute the
    identical first/last row."""
    e = load(spark, sf_dir, "events")
    key = F.struct("ts", "event_id")
    return (
        e.groupBy(F.date_trunc("day", F.col("ts")).alias("day"))
        .agg(
            F.min_by("value", key).alias("open_v"),
            F.max("value").alias("high_v"),
            F.min("value").alias("low_v"),
            F.max_by("value", key).alias("close_v"),
            F.count("*").alias("n_events"),
        )
    )


@register(
    "events_interarrival_stats",
    oracle="""
    WITH g AS (
      SELECT event_type,
             epoch_us(ts) - LAG(epoch_us(ts)) OVER (
               PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS gap_us
      FROM events
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_gaps,
           CAST(SUM(gap_us) AS DOUBLE) / COUNT(*) / 1000000.0 AS avg_gap_s,
           CAST(MIN(gap_us) AS DOUBLE) / 1000000.0 AS min_gap_s,
           CAST(MAX(gap_us) AS DOUBLE) / 1000000.0 AS max_gap_s
    FROM g WHERE gap_us IS NOT NULL
    GROUP BY event_type
    """,
)
def events_interarrival_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-arrival-time statistics per event type: the gap between each
    event and the SAME USER's previous event (any type), grouped by the
    later event's type — the workload-characterization kernel behind
    rate limiting and session-gap tuning. Gap arithmetic is exact BIGINT
    microseconds (unix_micros / epoch_us); only the final /1e6 goes
    through doubles, identically on both engines. One shuffle on
    user_id for the lag window, one on event_type for the aggregate —
    both keys well-spread, so the plan survives scale-up."""
    e = load(spark, sf_dir, "events")
    # parquet ts is TIMESTAMP_NTZ; unix_micros needs an instant. The cast
    # applies the session timezone, which cancels in the gap differences.
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    w = Window.partitionBy("user_id").orderBy(F.col("us"), F.col("event_id"))
    g = (
        e.select("user_id", "event_type", "event_id", us.alias("us"))
        .withColumn("gap_us", F.col("us") - F.lag("us").over(w))
        .filter(F.col("gap_us").isNotNull())
    )
    return g.groupBy("event_type").agg(
        F.count("*").alias("n_gaps"),
        (F.sum("gap_us").cast("double") / F.count("*") / F.lit(1000000.0)).alias(
            "avg_gap_s"
        ),
        (F.min("gap_us").cast("double") / F.lit(1000000.0)).alias("min_gap_s"),
        (F.max("gap_us").cast("double") / F.lit(1000000.0)).alias("max_gap_s"),
    )


@register(
    "rollup_order_date_hierarchy",
    oracle=f"""
    WITH b AS (
      SELECT CAST(EXTRACT(year FROM o_orderdate) AS INT) AS yr,
             CAST(EXTRACT(month FROM o_orderdate) AS INT) AS mth,
             o_totalprice
      FROM orders
    )
    SELECT yr, mth,
           CAST(GROUPING(yr) AS INT) AS g_yr,
           CAST(GROUPING(mth) AS INT) AS g_mth,
           {bigcount_sql()} AS n_orders,
           {dsum_sql("o_totalprice")} AS total_price
    FROM b GROUP BY ROLLUP(yr, mth)
    HAVING COUNT(*) > 0
    """,
)
def rollup_order_date_hierarchy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The hypertable-style time rollup: order totals at day->month->year
    granularity in ONE pass via GROUP BY ROLLUP(year, month) — subtotal
    rows (month=NULL) and the grand total (year=NULL) come from the same
    partial aggregates, with GROUPING() indicators to tell a subtotal
    from a real NULL key. At 100 TB this replaces three separate
    aggregation jobs with one shuffle; sums ride the decimal discipline
    (catalog.py)."""
    from ..catalog import dsum

    o = load(spark, sf_dir, "orders").select(
        F.year("o_orderdate").cast("int").alias("yr"),
        F.month("o_orderdate").cast("int").alias("mth"),
        "o_totalprice",
    )
    return (
        o.rollup("yr", "mth")
        .agg(
            F.grouping("yr").cast("int").alias("g_yr"),
            F.grouping("mth").cast("int").alias("g_mth"),
            F.count("*").alias("n_orders"),
            dsum(F.col("o_totalprice")).alias("total_price"),
        )
        .select("yr", "mth", "g_yr", "g_mth", "n_orders", "total_price")
    )


@register(
    "daily_new_customers_cumulative",
    oracle="""
    WITH first_order AS (
      SELECT o_custkey, date_trunc('day', MIN(o_orderdate)) AS day
      FROM orders GROUP BY o_custkey
    ),
    daily AS (
      SELECT day, CAST(COUNT(*) AS BIGINT) AS n_new
      FROM first_order GROUP BY day
    )
    SELECT day, n_new,
           CAST(SUM(n_new) OVER (ORDER BY day
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             AS cum_customers
    FROM daily
    """,
)
def daily_new_customers_cumulative(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The new-customer acquisition curve: each customer's first order
    day, bucketed daily, with the running total — the growth chart every
    product dashboard opens with. Two hash aggregates (per-customer min,
    per-day count) shrink the data to one row per DAY before the
    running total, which uses the two-pass distributed cumsum
    (operators/ranking.py) — calendar-sized input today, but the same
    plan shape survives second-granularity event time at any volume.
    Integer counts throughout — order-free addition, no float
    discipline needed."""
    from ..operators.ranking import distributed_cumsum

    o = load(spark, sf_dir, "orders")
    first = o.groupBy("o_custkey").agg(
        F.date_trunc("day", F.min("o_orderdate")).alias("day")
    )
    daily = first.groupBy("day").agg(F.count("*").alias("n_new"))
    return distributed_cumsum(
        daily, [F.col("day")], F.col("n_new"), cum_col="__cum"
    ).select("day", "n_new", F.col("__cum").cast("bigint").alias("cum_customers"))


@register(
    "events_anomaly_mad",
    oracle=f"""
    WITH med AS (
      -- explicit interpolation (catalog.pctile_sql), not quantile_cont
      -- (tied-bracketing-values ulp drift, round-10 probe); NaN values
      -- stay IN the list — both engines sort NaN above +Inf, matching
      -- Spark's percentile semantics
      SELECT event_type,
             {pctile_sql("list(value ORDER BY value) FILTER (value IS NOT NULL)", "0.5")} AS med_v
      FROM events GROUP BY event_type
    ),
    mad AS (
      SELECT e.event_type,
             {pctile_sql("list(abs(e.value - m.med_v) ORDER BY abs(e.value - m.med_v)) FILTER (abs(e.value - m.med_v) IS NOT NULL)", "0.5")} AS mad_v
      FROM events e JOIN med m ON m.event_type = e.event_type
      GROUP BY e.event_type
    )
    SELECT e.event_id, e.event_type, e.value,
           ((e.value - m.med_v) / (1.4826 * d.mad_v)) AS robust_z
    FROM events e
    JOIN med m ON m.event_type = e.event_type
    JOIN mad d ON d.event_type = e.event_type
    WHERE abs((e.value - m.med_v) / (1.4826 * d.mad_v)) >= 3.5
    """,
)
def events_anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust (median/MAD) anomaly flagging — the outlier detector that
    z-scores cannot be: a handful of extreme values inflate the mean
    and stddev until they mask themselves, while the median and the
    median-absolute-deviation ignore them. Three passes (median, MAD,
    probe), each reducing to per-type scalars that broadcast back onto
    the stream; the oracle states the percentile interpolation
    explicitly (catalog.pctile_sql — quantile_cont drifts an ulp on
    tied bracketing values, round-10 probe), and 1.4826 (the
    normal-consistency constant) is one identical multiply. Flags
    |robust z| >= 3.5."""
    e = load(spark, sf_dir, "events")
    med = e.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("med_v")
    )
    mad = (
        e.join(F.broadcast(med), "event_type")
        .groupBy("event_type")
        .agg(
            F.expr("percentile(abs(value - med_v), 0.5)").alias("mad_v")
        )
    )
    # try_divide: a type where >= half the values equal the median has
    # MAD 0 — DuckDB float /0 is NULL (robust_z NULL -> filtered),
    # ANSI Spark raises (round-8 time-edge probe)
    score = F.try_divide(
        F.col("value") - F.col("med_v"), F.lit(1.4826) * F.col("mad_v")
    )
    return (
        e.join(F.broadcast(med), "event_type")
        .join(F.broadcast(mad), "event_type")
        .select("event_id", "event_type", "value", score.alias("robust_z"))
        .filter(F.abs(F.col("robust_z")) >= 3.5)
    )


@register(
    "events_hourly_heatmap",
    oracle=f"""
    SELECT CAST((CAST(floor(epoch(ts) / 86400.0) AS BIGINT) + 4) % 7 AS INT)
             AS dow,
           CAST(EXTRACT(hour FROM ts) AS INT) AS hour_of_day,
           {bigcount_sql()} AS n_events,
           {dsum_sql("value")} AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
)
def events_hourly_heatmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonality heatmap: events bucketed by (day-of-week, hour) — the
    weekly-rhythm view behind capacity planning and anomaly baselines.
    Day-of-week is computed from epoch days ((d+4) % 7, 0=Sunday)
    rather than each engine's dayofweek() — their numbering conventions
    differ (Spark 1=Sunday, DuckDB 0=Sunday), and the arithmetic form
    is convention-free. One aggregate to a 7x24-row relation."""
    e = load(spark, sf_dir, "events")
    epoch_s = F.unix_micros(F.col("ts").cast("timestamp")).cast("double") / F.lit(
        1_000_000.0
    )
    dow = ((F.floor(epoch_s / 86400.0).cast("bigint") + 4) % 7).cast("int")
    return (
        e.groupBy(
            dow.alias("dow"), F.hour("ts").cast("int").alias("hour_of_day")
        )
        .agg(F.count("*").alias("n_events"), dsum(F.col("value")).alias("sum_value"))
    )


@register(
    "timeseries_interpolate_linear",
    oracle="""
    WITH e AS (
      SELECT * FROM events WHERE event_type = 'purchase' AND event_id % 37 = 0
    ),
    b AS (
      SELECT date_trunc('day', MIN(ts)) AS d0, date_trunc('day', MAX(ts)) AS d1
      FROM e
    ),
    spine AS (
      SELECT unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS day FROM b
    ),
    actual AS (
      SELECT date_trunc('day', ts) AS day,
             CAST(CAST(SUM(CAST(value AS DECIMAL(30,6))) AS VARCHAR) AS DOUBLE)
               AS v
      FROM e GROUP BY 1
    ),
    joined AS (
      SELECT s.day, a.v FROM spine s LEFT JOIN actual a ON a.day = s.day
    ),
    ctx AS (
      SELECT day, v,
             LAST_VALUE(v IGNORE NULLS) OVER (
               PARTITION BY date_part('year', day)
               ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS prev_v,
             LAST_VALUE(CASE WHEN v IS NOT NULL THEN day END IGNORE NULLS) OVER (
               PARTITION BY date_part('year', day)
               ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS prev_day,
             FIRST_VALUE(v IGNORE NULLS) OVER (
               PARTITION BY date_part('year', day)
               ORDER BY day ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING
             ) AS next_v,
             FIRST_VALUE(CASE WHEN v IS NOT NULL THEN day END IGNORE NULLS) OVER (
               PARTITION BY date_part('year', day)
               ORDER BY day ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING
             ) AS next_day
      FROM joined
    )
    SELECT day,
           (v IS NOT NULL) AS observed,
           CASE
             WHEN v IS NOT NULL THEN v
             ELSE prev_v + (next_v - prev_v)
                  * (CAST(date_diff('day', prev_day, day) AS DOUBLE)
                     / CAST(date_diff('day', prev_day, next_day) AS DOUBLE))
           END AS value_interp
    FROM ctx
    """,
)
def timeseries_interpolate_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-filled daily series with LINEAR interpolation (the resample +
    interpolate step of sensor/metric pipelines): a thinned purchase
    stream (event_id % 37 — deliberately sparse so gaps exist at small
    SF) is summed per day, the date spine left-joined, and missing days
    get prev + (next-prev) * day_frac from the nearest observed
    neighbors on each side via IGNORE NULLS window folds. Per-day sums
    ride the decimal bridge; the interpolation itself is the identical
    (+,-,*,/) IEEE expression in both engines. The single-series demo
    orders one calendar-sized window; the grouped form adds
    partitionBy(series) and is the 100 TB layout (a calendar is always
    tiny — the window never sees raw events). NOTE: the oracle-visible
    windows here run over the 30-row spine, not data-sized input (the
    no-single-partition-window guard allowlists nothing — this query
    passes it because WindowExec sees the spine side only after the
    day-level aggregate)."""
    e = load(spark, sf_dir, "events").filter(
        (F.col("event_type") == "purchase") & (F.col("event_id") % 37 == 0)
    )
    bounds = e.agg(
        F.date_trunc("day", F.min("ts")).alias("d0"),
        F.date_trunc("day", F.max("ts")).alias("d1"),
    )
    spine = bounds.select(
        F.explode(
            F.sequence(F.col("d0"), F.col("d1"), F.expr("INTERVAL 1 DAY"))
        ).alias("day")
    )
    actual = e.groupBy(F.date_trunc("day", F.col("ts")).alias("day")).agg(
        dsum(F.col("value")).alias("v")
    )
    joined = spine.join(actual, "day", "left")
    # calendar-sized window: partition by a constant derived marker is
    # unnecessary — but to keep the catalog free of partition-less
    # windows, bucket by year (gaps never span a year boundary in the
    # fixture ranges; the grouped production form partitions by series)
    j2 = joined.withColumn("__yb", F.year("day"))
    wp = Window.partitionBy("__yb").orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    wf = Window.partitionBy("__yb").orderBy("day").rowsBetween(
        Window.currentRow, Window.unboundedFollowing
    )
    day_if_obs = F.when(F.col("v").isNotNull(), F.col("day"))
    ctx = j2.select(
        "day",
        "v",
        F.last("v", ignorenulls=True).over(wp).alias("prev_v"),
        F.last(day_if_obs, ignorenulls=True).over(wp).alias("prev_day"),
        F.first("v", ignorenulls=True).over(wf).alias("next_v"),
        F.first(day_if_obs, ignorenulls=True).over(wf).alias("next_day"),
    )
    frac = F.datediff(F.col("day"), F.col("prev_day")).cast("double") / F.datediff(
        F.col("next_day"), F.col("prev_day")
    ).cast("double")
    return ctx.select(
        "day",
        F.col("v").isNotNull().alias("observed"),
        F.when(F.col("v").isNotNull(), F.col("v"))
        .otherwise(F.col("prev_v") + (F.col("next_v") - F.col("prev_v")) * frac)
        .alias("value_interp"),
    )


@register(
    "cdc_compact_latest_events",
    oracle="""
    WITH ranked AS (
      SELECT user_id, event_type, ts, value, event_id,
             ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                ORDER BY ts DESC, event_id DESC) AS rn,
             COUNT(*) OVER (PARTITION BY user_id, event_type) AS n_versions
      FROM events
    )
    SELECT user_id, event_type, ts AS last_ts, value AS last_value,
           CAST(n_versions AS BIGINT) AS n_versions
    FROM ranked WHERE rn = 1
    """,
)
def cdc_compact_latest_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC latest-wins compaction: collapse each (user, event_type)
    change stream to its most recent version (ts tiebroken by event_id
    — a total order, so the keeper is unique) plus the version count —
    the upsert-compaction kernel behind every snapshot table and the
    batch twin of streaming dropDuplicates-keep-last. One ranking
    window PARTITIONED BY the change key: parallelism is key-wide and
    per-task state is one key's version list. At 100 TB this is the
    shape log-structured table compaction (Delta/Iceberg merge-on-read)
    executes under the hood."""
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    wc = Window.partitionBy("user_id", "event_type")
    return (
        e.select(
            "user_id",
            "event_type",
            "ts",
            "value",
            "event_id",
            F.row_number().over(w).alias("rn"),
            F.count("*").over(wc).cast("bigint").alias("n_versions"),
        )
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            "event_type",
            F.col("ts").alias("last_ts"),
            F.col("value").alias("last_value"),
            "n_versions",
        )
    )


@register(
    "event_transition_matrix",
    oracle=f"""
    WITH pairs AS (
      SELECT LAG(event_type) OVER (
               PARTITION BY user_id ORDER BY ts NULLS LAST, event_id
             ) AS prev_type,
             event_type AS next_type
      FROM events
    ),
    counts AS (
      SELECT prev_type, next_type, {bigcount_sql()} AS n_transitions
      FROM pairs WHERE prev_type IS NOT NULL
      GROUP BY prev_type, next_type
    )
    SELECT prev_type, next_type, n_transitions,
           CAST(n_transitions AS DOUBLE)
           / CAST(SUM(n_transitions) OVER (PARTITION BY prev_type) AS DOUBLE)
             AS p
    FROM counts
    ORDER BY prev_type, next_type
    """,
)
def event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event streams:
    P(next_type | prev_type) from time-ordered lag pairs. The lag window
    partitions by user (bounded partitions); the transition counts
    collapse to |event_types|^2 rows, so the per-prev normalizing window
    runs over a handful of rows — nothing global. The probability is an
    exact-integer ratio cast to double, deterministic in both engines.
    (ts, event_id) ordering pins lag pairs under timestamp ties."""
    from pyspark.sql import Window

    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc_nulls_last(), "event_id")
    pairs = (
        e.select(F.lag("event_type").over(w).alias("prev_type"),
                 F.col("event_type").alias("next_type"))
        .filter(F.col("prev_type").isNotNull())
    )
    counts = pairs.groupBy("prev_type", "next_type").agg(
        F.count("*").alias("n_transitions")
    )
    wp = Window.partitionBy("prev_type")
    return (
        counts.withColumn(
            "p",
            F.col("n_transitions").cast("double")
            / F.sum("n_transitions").over(wp).cast("double"),
        )
        .orderBy("prev_type", "next_type")
    )


_EWMA_W = 8  # truncated history: current event + 7 preceding


@register(
    "events_ewma_value",
    oracle=f"""
    WITH w AS (
      SELECT event_id, user_id, ts, value,
             list_filter(list(value) OVER (
               PARTITION BY user_id ORDER BY ts NULLS LAST, event_id
               ROWS BETWEEN {_EWMA_W - 1} PRECEDING AND CURRENT ROW
             ), v -> v IS NOT NULL) AS a
      FROM events
    )
    SELECT event_id, user_id, ts, value,
           CASE WHEN len(a) = 0 THEN NULL ELSE
             list_reduce(
               list_transform(generate_series(1, len(a)),
                 i -> a[i] / CAST(1 << (len(a) - i) AS DOUBLE)),
               (x, y) -> x + y)
             / (CAST((1 << len(a)) - 1 AS DOUBLE)
                / CAST(1 << (len(a) - 1) AS DOUBLE))
           END AS ewma
    FROM w
    ORDER BY user_id, ts, event_id
    """,
)
def events_ewma_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted moving average of the event value per
    user (alpha = 1/2, truncated at the last 8 events, weights
    renormalized over the visible window). EWMA is normally hostile to
    bit-exact distributed computation — the recurrence is order-
    dependent float math — but alpha = 1/2 makes every weight 2^-k, an
    EXACT power-of-two scaling, and the weighted sum folds the frame
    array left-to-right identically in both engines; the weight
    normalizer (2^m - 1)/2^(m-1) is an exact odd/power-of-two quotient.
    Scale shape: per-user window partitions (bounded), frame capped at
    8 rows, so state per row is O(8) — the same plan Structured
    Streaming's sliding aggregate would run. No global window, no UDF.

    NULL values (round-8 edge-relational probe): Spark's collect_list
    silently DROPS frame nulls while DuckDB's list() keeps them, so the
    oracle applies list_filter to reach the identical array; a frame of
    only-null values leaves an EMPTY array, whose EWMA is NULL on both
    sides (the nullif guard below — element_at(den, 0) is an ANSI error
    — and the oracle's CASE, since DuckDB's list_reduce refuses empty
    input)."""
    from pyspark.sql import Window

    e = load(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc_nulls_last(), "event_id")
        .rowsBetween(-(_EWMA_W - 1), 0)
    )
    a = F.collect_list("value").over(w)
    pow2 = F.array(*[F.lit(float(1 << k)) for k in range(_EWMA_W)])
    # den[m] = (2^m - 1) / 2^(m-1): both operands exact, quotient has an
    # m-bit significand -> exactly representable, so the Python-computed
    # literal equals DuckDB's in-query expression bit-for-bit
    den = F.array(
        *[F.lit(((1 << m) - 1) / float(1 << (m - 1))) for m in range(1, _EWMA_W + 1)]
    )
    m = F.size(F.col("a"))
    num = F.aggregate(
        F.transform(
            F.col("a"), lambda x, i: x / F.element_at(pow2, m - i)
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    return (
        e.select("event_id", "user_id", "ts", "value", a.alias("a"))
        .select(
            "event_id",
            "user_id",
            "ts",
            "value",
            # when-guard, NOT nullif: feeding a nullable conditional
            # index into element_at hits a Spark 4.1.2 codegen bug —
            # the null flag of `if (m=0) null else m` is ignored and
            # the garbage 0 value indexes arr[size] (last element);
            # the interpreted path returns NULL correctly. when()
            # short-circuits so element_at only ever sees m >= 1.
            F.when(m > 0, num / F.element_at(den, m)).alias("ewma"),
        )
        .orderBy("user_id", "ts", "event_id")
    )


@register(
    "events_twap_daily",
    oracle=f"""
    WITH p AS (
      SELECT user_id, ts, value,
             LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts NULLS LAST, event_id) AS nts
      FROM events
    ),
    seg AS (
      SELECT user_id, date_trunc('day', ts) AS day,
             {cents_sql("value", "1000000.0")} AS value_e6,
             CAST(epoch_us(nts - ts) AS BIGINT) AS dur_us
      FROM p WHERE nts IS NOT NULL
    )
    SELECT user_id, day,
           CASE WHEN SUM(dur_us) > 0 THEN
             CAST(CAST(SUM(CAST(value_e6 AS HUGEINT) * dur_us) AS VARCHAR)
                  AS DOUBLE)
             / (CAST(SUM(dur_us) AS DOUBLE) * 1000000.0)
           END AS twap,
           CAST(SUM(dur_us) AS BIGINT) AS total_us
    FROM seg
    GROUP BY user_id, day
    ORDER BY user_id, day
    """,
)
def events_twap_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average of the event value per user per day (the
    TWAP kernel of financial/telemetry rollups): each observation is
    weighted by how long it remained current (microseconds to the next
    event in that user's stream; open segments with no successor are
    excluded). Determinism is ALL-INTEGER: values quantize to exact e6
    fixed-point (floor(v*1e6+0.5) — the double multiply and floor are
    IEEE-identical in both engines), weights are exact integer
    microseconds, and the weighted sum accumulates their int products
    exactly (Spark DECIMAL(38,0), DuckDB HUGEINT) — the naive
    double->DECIMAL(30,6) route drifts a ulp here because rounding a
    ~1e14-magnitude double at the 6th decimal is not engine-portable.
    One final double division. Scale: the lead window partitions per
    user (bounded); one (user, day) hash aggregate with map-side
    combine — no global state."""
    from pyspark.sql import Window

    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc_nulls_last(), "event_id")
    seg = (
        e.select(
            "user_id",
            "ts",
            "value",
            F.lead("ts").over(w).alias("nts"),
        )
        .filter(F.col("nts").isNotNull())
        .select(
            "user_id",
            F.date_trunc("day", F.col("ts")).alias("day"),
            cents(F.col("value"), 1000000.0).alias("value_e6"),
            (
                F.unix_micros(F.col("nts").cast("timestamp"))
                - F.unix_micros(F.col("ts").cast("timestamp"))
            ).alias("dur_us"),
        )
    )
    # zero-total-duration day (round-10 combined-edge pin): a user-day
    # whose EVERY segment is zero microseconds — duplicate instants (or
    # sub-microsecond ns ties truncated by unix_micros) with the next
    # distinct instant falling on a later day — has no time-weighted
    # content. TWAP is NULL, the row is kept (observations existed).
    # Unguarded, Spark ANSI raises DIVIDE_BY_ZERO where DuckDB emits
    # 0/0.0 = NaN: divergent AND both wrong for the semantics.
    total = F.sum("dur_us")
    return (
        seg.groupBy("user_id", "day")
        .agg(
            F.when(
                total > 0,
                F.sum(
                    F.col("value_e6").cast("decimal(19,0)")
                    * F.col("dur_us").cast("decimal(19,0)")
                )
                .cast("string")
                .cast("double")
                / (total.cast("double") * F.lit(1000000.0)),
            ).alias("twap"),
            F.sum("dur_us").alias("total_us"),
        )
        .orderBy("user_id", "day")
    )


@register(
    "rolling_7d_active_users",
    oracle="""
    WITH du AS (
      SELECT DISTINCT date_trunc('day', ts) AS day, user_id FROM events
    ),
    assigned AS (
      SELECT day + INTERVAL (o) DAY AS target_day, user_id
      FROM du, unnest(generate_series(0, 6)) AS t(o)
    ),
    bounds AS (SELECT MAX(day) AS dmax FROM du)
    SELECT target_day AS day,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS active_users_7d
    FROM assigned CROSS JOIN bounds
    WHERE target_day <= dmax
    GROUP BY target_day
    ORDER BY target_day
    """,
)
def rolling_7d_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-day distinct active users per day — the WAU/DAU-style
    engagement metric. A RANGE BETWEEN window cannot compute windowed
    COUNT(DISTINCT); the distributed form ASSIGNS each (user, day) to
    the 7 calendar days whose trailing window contains it (a 7x
    explode, the sliding-window twin's move) and distinct-counts per
    target day — partial aggregation dedups (day, user) map-side, so
    the shuffle carries at most 7x the distinct pairs, not raw events.
    Days beyond the observed max are clipped so every reported window
    has its full data. Exact integers only."""
    e = load(spark, sf_dir, "events")
    du = e.select(
        F.date_trunc("day", F.col("ts")).alias("day"), "user_id"
    ).distinct()
    offsets = F.sequence(F.lit(0), F.lit(6))
    assigned = du.select(
        F.explode(offsets).alias("o"), "day", "user_id"
    ).select(
        F.timestamp_add("DAY", F.col("o"), F.col("day")).alias("day"),
        "user_id",
    )
    dmax = du.agg(F.max("day").alias("dmax"))
    return (
        assigned.crossJoin(F.broadcast(dmax))
        .filter(F.col("day") <= F.col("dmax"))
        .groupBy("day")
        .agg(F.count_distinct("user_id").alias("active_users_7d"))
        .orderBy("day")
    )


@register(
    "events_changepoint_daily",
    oracle="""
    WITH daily AS (
      SELECT date_trunc('day', ts) AS day, CAST(COUNT(*) AS BIGINT) AS x
      FROM events WHERE event_type = 'purchase'
      GROUP BY 1
    ),
    t AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS nd, CAST(SUM(x) AS BIGINT) AS total
      FROM daily
    ),
    c AS (
      SELECT day, x,
             SUM(x * nd - total) OVER (ORDER BY day
                                       ROWS UNBOUNDED PRECEDING) AS s_scaled
      FROM daily CROSS JOIN t
    )
    SELECT day AS changepoint_day, x AS n_that_day,
           CAST(s_scaled AS BIGINT) AS cusum_scaled,
           CAST(abs(s_scaled) AS BIGINT) AS abs_cusum_scaled
    FROM c
    ORDER BY abs(s_scaled) DESC, day
    LIMIT 1
    """,
)
def events_changepoint_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single change-point estimate for the daily purchase-count series:
    the classic CUSUM statistic argmax_t |sum_{i<=t}(x_i - mean)|,
    computed in ALL-INTEGER arithmetic by scaling through the day count
    (sum(x_i*n - total) = n * sum(x_i - mean) — same argmax, zero
    rounding anywhere). int64 bound (round-7 audit): |dev| <= nd*x and
    |cusum| <= nd*total, with nd calendar-bounded (~2.4e3 at day grain),
    so overflow needs total >= 2^63/nd ~ 3.8e15 purchase events —
    document-and-hold, no widening needed; at a finer grain (the 100 TB
    seconds-grain case) nd grows to ~1e8 and the guard magnitude is
    still ~9.2e10 rows/grain-bucket. The cumulative sum uses the two-pass
    distributed kernel (a day-grain series still deserves the
    no-single-partition-window discipline — at 100 TB the grain might
    be seconds), and the argmax is TakeOrdered(1) with a day tiebreak.
    The oracle states the plain-window form."""
    from ..operators.ranking import distributed_cumsum

    e = load(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    daily = e.groupBy(F.date_trunc("day", F.col("ts")).alias("day")).agg(
        F.count("*").alias("x")
    )
    t = daily.agg(
        F.count("*").alias("nd"), F.sum("x").alias("total")
    )
    scaled = daily.crossJoin(F.broadcast(t)).select(
        "day", "x", (F.col("x") * F.col("nd") - F.col("total")).alias("dev")
    )
    c = distributed_cumsum(scaled, [F.col("day")], F.col("dev"), cum_col="s_scaled")
    return (
        c.select(
            F.col("day").alias("changepoint_day"),
            F.col("x").alias("n_that_day"),
            F.col("s_scaled").cast("bigint").alias("cusum_scaled"),
            F.abs(F.col("s_scaled")).cast("bigint").alias("abs_cusum_scaled"),
        )
        .orderBy(F.col("abs_cusum_scaled").desc(), "changepoint_day")
        .limit(1)
    )


@register(
    "session_max_concurrency",
    oracle=f"""
    WITH flagged AS (
      -- event_id tiebreak in BOTH windows — see
      -- session_window_user_sessions (round-10 combined-edge probe)
      SELECT user_id, ts, event_id,
             CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id
                                          ORDER BY ts, event_id)
                       > INTERVAL '{GAP}'
                  OR LAG(ts) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events WHERE ts IS NOT NULL
    ),
    sess AS (
      SELECT user_id, ts,
             SUM(new_session) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id
                                    ROWS UNBOUNDED PRECEDING) AS sid
      FROM flagged
    ),
    sessions AS (
      SELECT user_id, MIN(ts) AS s, MAX(ts) + INTERVAL '{GAP}' AS e
      FROM sess GROUP BY user_id, sid
    ),
    pts AS (
      SELECT s AS t, 1 AS delta, user_id FROM sessions
      UNION ALL
      SELECT e AS t, -1 AS delta, user_id FROM sessions
    ),
    c AS (
      SELECT t, SUM(delta) OVER (ORDER BY t, delta, user_id
                                 ROWS UNBOUNDED PRECEDING) AS conc
      FROM pts
    ),
    m AS (SELECT MAX(conc) AS mxc FROM c),
    ns AS (SELECT {bigcount_sql()} AS n_sessions FROM sessions)
    SELECT CAST(m.mxc AS INT) AS max_concurrent,
           (SELECT MIN(t) FROM c WHERE conc = m.mxc) AS at_ts,
           ns.n_sessions
    FROM m CROSS JOIN ns
    """,
)
def session_max_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak number of simultaneously-open user sessions (capacity
    planning's max-concurrency metric) via the classic sweep line:
    every session contributes a +1 at its start and a -1 at its
    half-open end, and the running sum of deltas in (t, delta, user)
    order is the instantaneous concurrency — -1 sorts before +1 at
    equal timestamps, so a session ending exactly when another starts
    never overlaps it, matching session_window's [start, end)
    intervals. The running sum is the two-pass distributed cumsum
    (operators/ranking.py) over the endpoint relation — 2 rows per
    session, never a single-partition window — and the (t, delta,
    user_id) key is a total order (a user's session endpoints are
    pairwise distinct), so every per-row value is engine-exact
    integer arithmetic. Output: the peak, the first instant it is
    reached, and the session count."""
    from ..operators.ranking import distributed_cumsum

    e = load(spark, sf_dir, "events")
    sessions = (
        e.groupBy(F.session_window("ts", GAP).alias("w"), "user_id")
        .agg(F.lit(1).alias("one"))
        .select("user_id", F.col("w.start").alias("s"), F.col("w.end").alias("e"))
    )
    pts = sessions.select(
        F.col("s").alias("t"), F.lit(1).alias("delta"), "user_id"
    ).unionAll(
        sessions.select(F.col("e").alias("t"), F.lit(-1).alias("delta"), "user_id")
    )
    c = distributed_cumsum(
        pts, [F.col("t"), F.col("delta"), F.col("user_id")], F.col("delta"),
        cum_col="conc",
    )
    m = c.agg(F.max("conc").alias("mxc"))
    ns = sessions.agg(F.count("*").alias("n_sessions"))
    # final step is a GLOBAL aggregate, not groupBy(mxc): on an empty
    # events table the peak join is empty and groupBy would emit zero
    # rows, while the oracle's scalar subqueries emit one all-NULL row
    # (round-8 empty-fixture probe) — a global agg is one row either way
    return (
        c.join(F.broadcast(m), F.col("conc") == F.col("mxc"))
        .agg(
            F.max("mxc").cast("int").alias("max_concurrent"),
            F.min("t").alias("at_ts"),
        )
        .crossJoin(F.broadcast(ns))
    )


@register(
    "attribution_last_touch",
    oracle=f"""
    WITH touches AS (
      SELECT user_id, ts, arg_max(event_type, event_id) AS touch_type
      FROM events WHERE event_type IN ('click', 'view')
      GROUP BY user_id, ts
    ),
    purchases AS (
      SELECT user_id, ts, value FROM events WHERE event_type = 'purchase'
    ),
    attributed AS (
      SELECT p.value,
             CASE WHEN t.ts IS NULL
                       OR p.ts > t.ts + INTERVAL '7 days' THEN 'direct'
                  ELSE t.touch_type END AS channel
      FROM purchases p
      ASOF LEFT JOIN touches t
        ON p.user_id = t.user_id AND p.ts >= t.ts
    )
    SELECT channel, {bigcount_sql()} AS n_purchases,
           {dsum_sql("value")} AS revenue
    FROM attributed GROUP BY channel ORDER BY channel
    """,
)
def attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch marketing attribution: every purchase is credited to
    the user's most recent click/view at or before it, provided that
    touch is within a 7-day lookback; otherwise 'direct'. The core is
    the union-sort AS-OF join (operators/joins.py — one shuffle on
    user_id, no pair blow-up), with touches pre-deduplicated to one
    per (user, instant) by max event_id (arg_max twin in the oracle)
    so the as-of winner is deterministic. The lookback is exact
    microsecond interval arithmetic; revenue sums run through the
    decimal dsum discipline. Scales as a sort-merge join shape —
    per-user event streams co-partition and the window carry-forward
    is order-preserving."""
    from ..operators.joins import asof_join

    e = load(spark, sf_dir, "events")
    touches = (
        e.filter(F.col("event_type").isin("click", "view"))
        .groupBy("user_id", "ts")
        .agg(F.max_by("event_type", "event_id").alias("touch_type"))
        .select("user_id", F.col("ts").alias("touch_ts"), "touch_type")
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "value"
    )
    joined = asof_join(
        left=purchases,
        right=touches,
        on="user_id",
        left_time="ts",
        right_time="touch_ts",
        payload=["touch_ts", "touch_type"],
    )
    attributed = joined.select(
        "value",
        F.when(
            F.col("touch_ts").isNull()
            | (F.col("ts") > F.col("touch_ts") + F.expr("INTERVAL 7 DAYS")),
            F.lit("direct"),
        )
        .otherwise(F.col("touch_type"))
        .alias("channel"),
    )
    return (
        attributed.groupBy("channel")
        .agg(F.count("*").alias("n_purchases"), dsum(F.col("value")).alias("revenue"))
        .orderBy("channel")
    )


@register(
    "scd2_user_type_history",
    oracle="""
    WITH o AS (
      SELECT user_id, event_type, ts, event_id,
             LAG(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts NULLS LAST, event_id) AS prev
      FROM events
    ),
    runs AS (
      SELECT user_id, event_type, ts,
             SUM(CASE WHEN prev IS DISTINCT FROM event_type
                      THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY ts NULLS LAST, event_id
                     ROWS UNBOUNDED PRECEDING) AS run_id
      FROM o
    ),
    hist AS (
      SELECT user_id, event_type, run_id,
             MIN(ts) AS effective_from,
             CAST(COUNT(*) AS BIGINT) AS n_events
      FROM runs GROUP BY user_id, event_type, run_id
    )
    SELECT user_id, event_type, effective_from,
           LEAD(effective_from) OVER (PARTITION BY user_id
                                      ORDER BY run_id) AS effective_to,
           n_events,
           LEAD(effective_from) OVER (PARTITION BY user_id
                                      ORDER BY run_id) IS NULL AS is_current
    FROM hist
    ORDER BY user_id, effective_from, event_type
    """,
)
def scd2_user_type_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension type-2 history build: collapse each
    user's event stream into runs of consecutive identical event_type
    (gaps-and-islands), then emit one versioned row per run with
    [effective_from, effective_to) validity — effective_to is the next
    run's start, NULL marks the current version. This is the lakehouse
    dimension-history pattern (CDC feed -> SCD2 table); every window is
    partitioned by user_id so the plan is one hash exchange plus
    per-key sorts — no global state, survives any user-count scale-up.
    The (ts, event_id) ordering key is total, so run boundaries are
    engine-exact."""
    e = load(spark, sf_dir, "events")
    wo = Window.partitionBy("user_id").orderBy(F.col("ts").asc_nulls_last(), "event_id")
    runs = (
        e.select("user_id", "event_type", "ts", "event_id")
        .withColumn("prev", F.lag("event_type").over(wo))
        # NULL-SAFE boundary (round-9 text-edge pin): `prev <> type` is
        # NULL — i.e. "no boundary" — when either side is NULL, so a
        # NULL-typed event silently merged into the previous run and two
        # event_types shared one run_id, making the LEAD order ambiguous.
        # IS DISTINCT FROM treats NULL as its own type on both engines.
        .withColumn(
            "chg",
            F.when(~F.col("prev").eqNullSafe(F.col("event_type")), 1).otherwise(0),
        )
        .withColumn(
            "run_id",
            F.sum("chg").over(wo.rowsBetween(Window.unboundedPreceding, 0)),
        )
    )
    hist = runs.groupBy("user_id", "event_type", "run_id").agg(
        F.min("ts").alias("effective_from"), F.count("*").alias("n_events")
    )
    wr = Window.partitionBy("user_id").orderBy("run_id")
    return (
        hist.withColumn("effective_to", F.lead("effective_from").over(wr))
        .select(
            "user_id",
            "event_type",
            "effective_from",
            "effective_to",
            "n_events",
            F.col("effective_to").isNull().alias("is_current"),
        )
        # tiebreak: runs of one user can share effective_from when a
        # boundary falls between equal-ts events; adjacent runs differ
        # in event_type, so this ORDER BY is total (CLAUDE.md rule)
        .orderBy("user_id", "effective_from", "event_type")
    )


@register(
    "funnel_ordered_steps_1h",
    oracle="""
    WITH o AS (
      SELECT user_id, event_type, ts, event_id,
             MAX(CASE WHEN event_type = 'view' THEN ts END) OVER w1 AS lv
      FROM events
      WINDOW w1 AS (PARTITION BY user_id ORDER BY ts NULLS LAST, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
    ),
    o2 AS (
      SELECT user_id, event_type, ts, lv,
             MAX(CASE WHEN event_type = 'click' THEN lv END) OVER w2 AS qa
      FROM o
      WINDOW w2 AS (PARTITION BY user_id ORDER BY ts NULLS LAST, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
    ),
    flags AS (
      SELECT user_id,
             MAX(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS s1,
             MAX(CASE WHEN event_type = 'click' AND lv IS NOT NULL
                       AND lv >= ts - INTERVAL '1 hour' THEN 1 ELSE 0 END) AS s2,
             MAX(CASE WHEN event_type = 'purchase' AND qa IS NOT NULL
                       AND qa >= ts - INTERVAL '1 hour' THEN 1 ELSE 0 END) AS s3
      FROM o2 GROUP BY user_id
    )
    SELECT CAST(SUM(s1) AS BIGINT) AS n_view,
           CAST(SUM(s2) AS BIGINT) AS n_view_click_1h,
           CAST(SUM(s3) AS BIGINT) AS n_full_funnel_1h,
           CAST(SUM(s3) AS DOUBLE) / CAST(SUM(s1) AS DOUBLE) AS conversion
    FROM flags
    """,
)
def funnel_ordered_steps_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered 3-step funnel (view -> click -> purchase) completed
    within 1 hour of the anchoring view — the windowFunnel analytic.
    The naive form is a triple self-join (pair blow-up squared); this
    plan is TWO per-user carry-forward windows over one sort: lv = the
    latest view strictly before each row, qa = the best view-anchor
    among clicks strictly before each row (running max of lv over
    clicks). A purchase completes the funnel iff qa >= ts - 1h — any
    qualifying (view, click) chain exists exactly when the LATEST
    anchor qualifies, so the existence test needs no pair enumeration.
    Both windows share one (user_id, (ts, event_id)) sort: one hash
    exchange, zero joins, monotone funnel stages by construction.
    Strict ordering via the 1-PRECEDING frame; (ts, event_id) is a
    total order so every carry value is engine-exact."""
    e = load(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts", "event_id"
    )
    frame = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc_nulls_last(), "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    o = e.withColumn(
        "lv",
        F.max(F.when(F.col("event_type") == "view", F.col("ts"))).over(frame),
    )
    o2 = o.withColumn(
        "qa",
        F.max(F.when(F.col("event_type") == "click", F.col("lv"))).over(frame),
    )
    hour = F.expr("INTERVAL 1 HOUR")
    flags = o2.groupBy("user_id").agg(
        F.max(F.when(F.col("event_type") == "view", 1).otherwise(0)).alias("s1"),
        F.max(
            F.when(
                (F.col("event_type") == "click")
                & F.col("lv").isNotNull()
                & (F.col("lv") >= F.col("ts") - hour),
                1,
            ).otherwise(0)
        ).alias("s2"),
        F.max(
            F.when(
                (F.col("event_type") == "purchase")
                & F.col("qa").isNotNull()
                & (F.col("qa") >= F.col("ts") - hour),
                1,
            ).otherwise(0)
        ).alias("s3"),
    )
    return flags.agg(
        F.sum("s1").alias("n_view"),
        F.sum("s2").alias("n_view_click_1h"),
        F.sum("s3").alias("n_full_funnel_1h"),
        (F.sum("s3").cast("double") / F.sum("s1").cast("double")).alias(
            "conversion"
        ),
    )


@register(
    "forecast_seasonal_naive_backtest",
    oracle="""
    WITH daily AS (
      SELECT event_type, date_trunc('day', ts) AS day,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM events GROUP BY 1, 2
    ),
    joined AS (
      SELECT a.event_type, a.day, a.c, f.c AS forecast
      FROM daily a JOIN daily f
        ON f.event_type = a.event_type
       AND f.day = a.day - INTERVAL '7 days'
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_days_scored,
           CAST(SUM(abs(c - forecast)) AS BIGINT) AS abs_err_total,
           CAST(SUM(abs(c - forecast)) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
             AS mae,
           CAST(SUM(c - forecast) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
             AS mean_bias
    FROM joined GROUP BY event_type ORDER BY event_type
    """,
)
def forecast_seasonal_naive_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backtest of the seasonal-naive forecaster (predict today's event
    count with the count from the same weekday last week) — the
    baseline every demand-forecasting pipeline must beat, and its MAE
    is the standard scaling denominator (MASE). The lag-7 lookup is an
    equi-join of the daily aggregate with itself shifted 7 days (no
    window, handles sparse days by scoring only days whose base
    exists), and the errors are exact integers — only the two final
    per-type divides touch doubles. Overflow posture (round-7 audit):
    no products anywhere; SUM(|c - forecast|) <= total event count, so
    int64 holds to 9.2e18 events. Co-partitioned self-join on
    (event_type, day): one shuffle of the tiny daily relation."""
    e = load(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type", F.date_trunc("day", F.col("ts")).alias("day")
    ).agg(F.count("*").alias("c"))
    f = daily.select(
        "event_type",
        (F.col("day") + F.expr("INTERVAL 7 DAYS")).alias("day"),
        F.col("c").alias("forecast"),
    )
    joined = daily.join(f, ["event_type", "day"])
    err = F.col("c") - F.col("forecast")
    return (
        joined.groupBy("event_type")
        .agg(
            F.count("*").alias("n_days_scored"),
            F.sum(F.abs(err)).alias("abs_err_total"),
            (F.sum(F.abs(err)).cast("double") / F.count("*").cast("double")).alias(
                "mae"
            ),
            (F.sum(err).cast("double") / F.count("*").cast("double")).alias(
                "mean_bias"
            ),
        )
        .orderBy("event_type")
    )


@register(
    "cohort_ltv_monthly",
    oracle=f"""
    WITH first_order AS (
      SELECT o_custkey,
             MIN(date_trunc('month', o_orderdate)) AS cohort_month
      FROM orders GROUP BY o_custkey
    ),
    sized AS (
      SELECT cohort_month, CAST(COUNT(*) AS BIGINT) AS n_customers
      FROM first_order GROUP BY cohort_month
    ),
    rev AS (
      SELECT f.cohort_month,
             CAST((year(o.o_orderdate) * 12 + month(o.o_orderdate))
                - (year(f.cohort_month) * 12 + month(f.cohort_month))
                AS INT) AS month_offset,
             CAST(SUM({cents_sql("o.o_totalprice")}) AS BIGINT) AS rev_cents
      FROM orders o JOIN first_order f ON f.o_custkey = o.o_custkey
      GROUP BY 1, 2
    ),
    cum AS (
      SELECT cohort_month, month_offset, rev_cents,
             CAST(SUM(rev_cents) OVER (PARTITION BY cohort_month
                                       ORDER BY month_offset NULLS LAST
                                       ROWS UNBOUNDED PRECEDING) AS BIGINT)
               AS cum_rev_cents
      FROM rev
    )
    SELECT c.cohort_month, c.month_offset, s.n_customers,
           c.rev_cents, c.cum_rev_cents,
           CAST(c.cum_rev_cents AS DOUBLE)
             / (100.0 * CAST(s.n_customers AS DOUBLE)) AS ltv_per_customer
    FROM cum c JOIN sized s ON s.cohort_month = c.cohort_month
    ORDER BY c.cohort_month, c.month_offset
    """,
)
def cohort_ltv_monthly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort lifetime-value curve: customers bucketed by first-order
    month, cumulative revenue per cohort by months-since-acquisition,
    and the per-customer LTV — the revenue twin of the retention matrix
    (cohort_weekly_retention counts who comes back; this prices them).
    Revenue is exact integer cents end to end, month offsets are exact
    integer month arithmetic, and the cumulative window runs over the
    POST-AGGREGATE (cohort, offset) relation — thousands of rows at any
    corpus size, so PARTITION BY cohort is safe here (the fact-sized
    windows this catalog avoids are pre-aggregate). One user-keyed
    join against the broadcast-able first_order relation, two keyed
    aggregates; the only doubles are the final LTV divide."""
    o = load(spark, sf_dir, "orders")
    first_order = o.groupBy("o_custkey").agg(
        F.date_trunc("month", F.min("o_orderdate")).alias("cohort_month")
    )
    sized = first_order.groupBy("cohort_month").agg(
        F.count("*").alias("n_customers")
    )
    months = lambda c: F.year(c) * 12 + F.month(c)
    rev = (
        o.join(first_order, "o_custkey")
        .groupBy(
            "cohort_month",
            (months(F.col("o_orderdate")) - months(F.col("cohort_month")))
            .cast("int")
            .alias("month_offset"),
        )
        .agg(
            F.sum(cents(F.col("o_totalprice"))).alias("rev_cents")
        )
    )
    w = (
        Window.partitionBy("cohort_month")
        # explicit NULLS LAST (DuckDB's default; Spark's ASC default is
        # NULLS FIRST) — a null-date order yields a NULL month_offset
        # and must accumulate at the END on both engines (round-8 edge
        # probe; see plans/windows.py docstring for the convention)
        .orderBy(F.col("month_offset").asc_nulls_last())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = rev.withColumn(
        "cum_rev_cents", F.sum("rev_cents").over(w).cast("bigint")
    )
    return (
        cum.join(F.broadcast(sized), "cohort_month")
        .select(
            "cohort_month",
            "month_offset",
            "n_customers",
            "rev_cents",
            "cum_rev_cents",
            (
                F.col("cum_rev_cents").cast("double")
                / (100.0 * F.col("n_customers").cast("double"))
            ).alias("ltv_per_customer"),
        )
        .orderBy("cohort_month", "month_offset")
    )


@register(
    "eval_markov_next_event_accuracy",
    oracle="""
    WITH pairs AS (
      SELECT LAG(event_type) OVER (
               PARTITION BY user_id ORDER BY ts NULLS LAST, event_id
             ) AS prev_type,
             event_type AS next_type,
             CAST(date_diff('day', DATE '1970-01-01',
                            CAST(date_trunc('day', ts) AS DATE)) AS BIGINT)
               AS epoch_day
      FROM events
    ),
    train AS (
      SELECT prev_type, next_type, CAST(COUNT(*) AS BIGINT) AS n
      FROM pairs WHERE prev_type IS NOT NULL AND epoch_day % 2 = 0
      GROUP BY prev_type, next_type
    ),
    pred AS (
      SELECT prev_type, next_type AS pred_type FROM (
        SELECT prev_type, next_type,
               ROW_NUMBER() OVER (PARTITION BY prev_type
                                  ORDER BY n DESC, next_type) AS r
        FROM train
      ) WHERE r = 1
    )
    SELECT t.prev_type,
           CAST(COUNT(*) AS BIGINT) AS n_test,
           CAST(SUM(CASE WHEN t.next_type = p.pred_type THEN 1 ELSE 0 END)
                AS BIGINT) AS n_correct,
           CAST(SUM(CASE WHEN t.next_type = p.pred_type THEN 1 ELSE 0 END)
                AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS accuracy
    FROM pairs t JOIN pred p ON p.prev_type = t.prev_type
    WHERE t.prev_type IS NOT NULL AND t.epoch_day % 2 = 1
    GROUP BY t.prev_type
    ORDER BY t.prev_type
    """,
)
def eval_markov_next_event_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Out-of-sample evaluation of the first-order Markov next-event
    model: the transition matrix is TRAINED on even epoch-days only,
    its per-state argmax prediction (ties to the smaller type) is then
    scored against the held-out odd-day transitions — the temporal-
    split baseline eval behind every next-action model, and the honest
    version of the in-sample accuracy (which is just the max row
    probability). Same per-user lag window as event_transition_matrix;
    the trained matrix collapses to |types|^2 rows and broadcasts onto
    the test pairs. Counts exact, one IEEE divide per state."""
    from pyspark.sql import Window

    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc_nulls_last(), "event_id")
    pairs = (
        e.select(
            F.lag("event_type").over(w).alias("prev_type"),
            F.col("event_type").alias("next_type"),
            F.datediff(
                F.date_trunc("day", F.col("ts")).cast("date"),
                F.lit("1970-01-01").cast("date"),
            )
            .cast("bigint")
            .alias("epoch_day"),
        )
        .filter(F.col("prev_type").isNotNull())
    )
    train = (
        pairs.filter(F.col("epoch_day") % 2 == 0)
        .groupBy("prev_type", "next_type")
        .agg(F.count("*").alias("n"))
    )
    wr = Window.partitionBy("prev_type").orderBy(F.col("n").desc(), "next_type")
    pred = (
        train.withColumn("r", F.row_number().over(wr))
        .filter(F.col("r") == 1)
        .select("prev_type", F.col("next_type").alias("pred_type"))
    )
    test = pairs.filter(F.col("epoch_day") % 2 == 1)
    correct = F.sum(
        F.when(F.col("next_type") == F.col("pred_type"), 1).otherwise(0)
    )
    return (
        test.join(F.broadcast(pred), "prev_type")
        .groupBy("prev_type")
        .agg(
            F.count("*").alias("n_test"),
            correct.alias("n_correct"),
            (correct.cast("double") / F.count("*").cast("double")).alias(
                "accuracy"
            ),
        )
        .orderBy("prev_type")
    )


# --- survival analysis -------------------------------------------------------

_KM_CHURN_DAYS = 90


@register(
    "survival_km_churn",
    oracle=f"""
    WITH per AS (
      SELECT o_custkey, MIN(o_orderdate) AS f, MAX(o_orderdate) AS l
      FROM orders GROUP BY o_custkey
    ),
    mx AS (SELECT MAX(o_orderdate) AS mx FROM orders),
    subj AS (
      SELECT CAST(date_diff('day', f, l) AS INT) AS dur,
             CASE WHEN date_diff('day', l, mx.mx) > {_KM_CHURN_DAYS}
                  THEN 1 ELSE 0 END AS ev
      FROM per CROSS JOIN mx
    ),
    g AS (
      SELECT dur, CAST(SUM(ev) AS BIGINT) AS d,
             CAST(COUNT(*) AS BIGINT) AS m
      FROM subj GROUP BY dur
    ),
    tot AS (SELECT CAST(SUM(m) AS BIGINT) AS n FROM g),
    cum AS (
      SELECT dur, d, m,
             CAST(SUM(m) OVER (ORDER BY dur ROWS UNBOUNDED PRECEDING)
                  AS BIGINT) AS cm
      FROM g
    ),
    evr AS (
      SELECT dur, d, (tot.n - cm + m) AS n_risk,
             1.0 - CAST(d AS DOUBLE) / CAST(tot.n - cm + m AS DOUBLE)
               AS factor
      FROM cum CROSS JOIN tot WHERE d > 0
    ),
    rnk AS (
      SELECT dur, d, n_risk, factor,
             ROW_NUMBER() OVER (ORDER BY dur) AS rn
      FROM evr
    ),
    fs AS (SELECT list(factor ORDER BY dur) AS fs FROM evr)
    SELECT dur AS t, CAST(n_risk AS BIGINT) AS n_risk, d AS n_events,
           list_reduce(list_slice(fs.fs, 1, rn), (a, b) -> a * b) AS surv
    FROM rnk CROSS JOIN fs ORDER BY t
    """,
)
def survival_km_churn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier survival curve for customer lifetime: duration =
    days between a customer's first and last order; the churn event is
    observed when the last order precedes the corpus horizon by more
    than 90 days, otherwise the subject is right-censored (still
    active). Classic estimator: S(t) = prod over event times t_i <= t
    of (1 - d_i / n_i), censored subjects counted at risk through
    their censoring time.

    Scale shape: the per-customer reduce and the per-duration (d, m)
    aggregate are plain hash aggregates; the at-risk counts ride the
    two-pass distributed cumsum (never a single-partition window); the
    ONLY driver-bounded state is the event-time factor array — bounded
    by DISTINCT durations (the size of the curve itself), not by
    customers — and the running product folds that array in duration
    order, the same deterministic left-fold discipline as the dot
    product (float multiplication is non-associative; a distributed
    two-pass product would not be bit-portable, a fixed-order fold
    is)."""
    from ..operators.ranking import distributed_cumsum, distributed_row_number

    o = load(spark, sf_dir, "orders").select("o_custkey", "o_orderdate")
    per = o.groupBy("o_custkey").agg(
        F.min("o_orderdate").alias("f"), F.max("o_orderdate").alias("l")
    )
    mx = o.agg(F.max("o_orderdate").alias("mx"))
    subj = per.crossJoin(F.broadcast(mx)).select(
        F.date_diff(F.col("l"), F.col("f")).cast("int").alias("dur"),
        F.when(
            F.date_diff(F.col("mx"), F.col("l")) > _KM_CHURN_DAYS, 1
        ).otherwise(0).alias("ev"),
    )
    g = subj.groupBy("dur").agg(
        F.sum("ev").cast("bigint").alias("d"),
        F.count("*").cast("bigint").alias("m"),
    )
    tot = g.agg(F.sum("m").cast("bigint").alias("n"))
    cum = distributed_cumsum(g, [F.col("dur")], F.col("m"), cum_col="cm")
    evr = (
        cum.crossJoin(F.broadcast(tot))
        .withColumn("n_risk", F.col("n") - F.col("cm") + F.col("m"))
        .filter(F.col("d") > 0)
        .select(
            "dur",
            "d",
            "n_risk",
            (
                F.lit(1.0)
                - F.col("d").cast("double") / F.col("n_risk").cast("double")
            ).alias("factor"),
        )
    )
    rnk = distributed_row_number(evr, [F.col("dur")], rn_col="rn")
    fs = evr.agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("dur", "factor"))),
            lambda s: s.factor,
        ).alias("fs")
    )
    return (
        rnk.crossJoin(F.broadcast(fs))
        .select(
            F.col("dur").alias("t"),
            F.col("n_risk").cast("bigint").alias("n_risk"),
            F.col("d").alias("n_events"),
            F.aggregate(
                F.slice("fs", F.lit(1), F.col("rn").cast("int")),
                F.lit(1.0),
                lambda acc, v: acc * v,
            ).alias("surv"),
        )
        .orderBy("t")
    )


@register(
    "trend_theilsen_daily_revenue",
    oracle=f"""
    WITH daily AS (
      -- HAVING: a day whose every amount is non-finite has no defined
      -- revenue point; it is excluded from the trend on both sides
      SELECT o_orderdate AS day,
             CAST(SUM({cents_sql("o_totalprice")}) AS BIGINT) AS cents
      FROM orders GROUP BY o_orderdate
      HAVING SUM({cents_sql("o_totalprice")}) IS NOT NULL
    ),
    x0 AS (SELECT MIN(day) AS d0 FROM daily),
    pts AS (
      SELECT CAST(date_diff('day', x0.d0, day) AS BIGINT) AS x, cents AS y
      FROM daily CROSS JOIN x0
    ),
    slopes AS (
      SELECT a.x AS xi, b.x AS xj,
             CAST(b.y - a.y AS DOUBLE) / CAST(b.x - a.x AS DOUBLE) AS s
      FROM pts a JOIN pts b ON a.x < b.x
    ),
    r AS (
      SELECT s, ROW_NUMBER() OVER (ORDER BY s, xi, xj) AS rn,
             COUNT(*) OVER () AS n
      FROM slopes
    ),
    med AS (
      SELECT SUM(CASE WHEN rn = (n + 1) // 2 THEN s ELSE 0 END) AS lo,
             SUM(CASE WHEN rn = n // 2 + 1 THEN s ELSE 0 END) AS hi
      FROM r
    ),
    ols AS (
      SELECT CAST(COUNT(*) AS HUGEINT) AS n,
             SUM(CAST(x AS HUGEINT)) AS sx,
             SUM(CAST(y AS HUGEINT)) AS sy,
             SUM(CAST(x AS HUGEINT) * y) AS sxy,
             SUM(CAST(x AS HUGEINT) * x) AS sxx
      FROM pts
    )
    SELECT CAST(ols.n AS BIGINT) AS n_days,
           (med.lo + med.hi) / 2.0 AS theilsen_slope_cents_per_day,
           (CAST(CAST(ols.n * ols.sxy - ols.sx * ols.sy AS VARCHAR) AS DOUBLE)
            / CAST(CAST(ols.n * ols.sxx - ols.sx * ols.sx AS VARCHAR) AS DOUBLE))
             AS ols_slope_cents_per_day
    FROM ols CROSS JOIN med
    """,
)
def trend_theilsen_daily_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-Sen robust trend of daily revenue (median of all pairwise
    slopes) next to the OLS slope it robustifies — the estimator a
    drift monitor uses when a few anomalous days would wreck least
    squares. Scale shape: the pairwise self-join is over DAILY
    aggregate points, bounded by the calendar (~2.4k days -> ~3M
    pairs), never corpus rows; the median rides the two-pass
    distributed rank. OLS moments are exact integer sums, but the
    normal-equation CROSS-PRODUCTS (n*sxy, sx*sy) overflow int64
    already at sf0.1 (measured 1.18x of 2^63 — caught by the round-6
    sf0.1 full-catalog gate, invisible at the driver's sf0.01), so the
    products run in DECIMAL(38,0) on the Spark side and HUGEINT in the
    oracle — both exact integer arithmetic over the ~2.4k-row daily
    aggregate, headroom to ~1e38 — and the exact differences convert
    through VARCHAR to double (the catalog.py dsum discipline) before
    the one double divide. The one int64 left is the per-day cents
    sub-aggregate (y): bounded by a single day's revenue in cents,
    ~9.4e14 at sf100 — 4 orders of magnitude of headroom, documented
    rather than widened (round-7 audit). The even-count median averages the two
    middle slopes — each an exact-integer ratio, so the average is one
    correctly-rounded op in both engines."""
    from ..operators.ranking import distributed_row_number

    o = load(spark, sf_dir, "orders")
    daily = (
        o.groupBy(F.col("o_orderdate").alias("day"))
        .agg(F.sum(cents(F.col("o_totalprice"))).cast("bigint").alias("cents"))
        # mirror of the oracle's HAVING: drop all-non-finite days
        .filter(F.col("cents").isNotNull())
    )
    x0 = daily.agg(F.min("day").alias("d0"))
    pts = daily.crossJoin(F.broadcast(x0)).select(
        F.date_diff(F.col("day"), F.col("d0")).cast("bigint").alias("x"),
        F.col("cents").alias("y"),
    )
    a, b = pts.alias("a"), pts.alias("b")
    slopes = a.join(b, F.col("a.x") < F.col("b.x")).select(
        F.col("a.x").alias("xi"),
        F.col("b.x").alias("xj"),
        (
            (F.col("b.y") - F.col("a.y")).cast("double")
            / (F.col("b.x") - F.col("a.x")).cast("double")
        ).alias("s"),
    )
    r = distributed_row_number(
        slopes, [F.col("s"), F.col("xi"), F.col("xj")], rn_col="rn", total_col="n"
    )
    # integer div, NOT `/` (double division would make the even-count
    # rank land on x.5 and silently select nothing)
    med = r.agg(
        F.sum(
            F.when(F.col("rn") == F.expr("(n + 1) div 2"), F.col("s")).otherwise(0.0)
        ).alias("lo"),
        F.sum(
            F.when(F.col("rn") == F.expr("n div 2 + 1"), F.col("s")).otherwise(0.0)
        ).alias("hi"),
    )
    # DECIMAL(38,0) everywhere the normal equations multiply: n*sxy and
    # sx*sy measure 1.18x of 2^63 at sf0.1 (ANSI multiplyExact aborts),
    # and int64 was never the right width for moment cross-products at
    # corpus scale anyway. The per-row products also multiply AFTER the
    # decimal cast (decimal(19,0) x decimal(19,0) -> decimal(38,0)),
    # mirroring the oracle's SUM(CAST(x AS HUGEINT) * y): x is
    # calendar-bounded (~2.5k) but y is daily revenue cents and grows
    # with SF, so an int64 per-row product has no structural bound.
    wide = "decimal(38,0)"
    xw = F.col("x").cast("decimal(19,0)")
    yw = F.col("y").cast("decimal(19,0)")
    ols = pts.agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum(F.col("x").cast(wide)).alias("sx"),
        F.sum(F.col("y").cast(wide)).alias("sy"),
        F.sum((xw * yw).cast(wide)).alias("sxy"),
        F.sum((xw * xw).cast(wide)).alias("sxx"),
    )
    nw = F.col("n").cast(wide)
    # exact integer difference -> string -> double: string conversion of
    # an exact decimal and string->double are correctly rounded in BOTH
    # engines (see catalog.dsum), so the one rounding site is shared
    num = (nw * F.col("sxy") - F.col("sx") * F.col("sy")).cast("string")
    den = (nw * F.col("sxx") - F.col("sx") * F.col("sx")).cast("string")
    return ols.crossJoin(F.broadcast(med)).select(
        F.col("n").alias("n_days"),
        ((F.col("lo") + F.col("hi")) / 2.0).alias("theilsen_slope_cents_per_day"),
        # try_divide: a single-point series has den = 0 (DuckDB /0 is
        # NULL, ANSI Spark raises — round-9 magnitude probe hit this
        # when the cents domain left one finite day standing)
        F.try_divide(num.cast("double"), den.cast("double")).alias(
            "ols_slope_cents_per_day"
        ),
    )
