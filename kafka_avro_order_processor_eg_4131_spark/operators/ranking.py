"""Distributed global ranking/cumulation: the two-pass range-partition
form of ROW_NUMBER() OVER (ORDER BY ...) and SUM() OVER (ORDER BY ...
ROWS UNBOUNDED PRECEDING), with NO single-partition window anywhere.

A naive global window (`Window.orderBy(...)` with no partitionBy) pulls
the whole relation onto ONE task — correct at fixture scale, fatal at
100 TB. The classic fix (what these helpers implement):

1. ``repartitionByRange`` on the sort key — partition i holds keys that
   sort before partition i+1's (Spark's RangePartitioner samples bounds
   deterministically), so a per-partition local rank is globally correct
   up to a constant per-partition offset;
2. rank/cumsum WITHIN each partition (``Window.partitionBy(pid)`` —
   parallel, bounded by partition size);
3. per-partition counts/sums (one tiny row per partition) turned into
   exclusive prefix offsets via a triangular self-join (partition-count
   squared / 2 rows — trivial, and warning-free where a global window
   over the counts would not be);
4. broadcast the offsets back and add.

Wall-clock is two shuffles (range partition + the tiny counts agg)
instead of one all-to-one funnel; the result is bit-identical to the
global window because the range partitioning + in-partition order is
the total order.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_PID = "__rk_pid"
_LOCAL = "__rk_local"
_OFF = "__rk_off"


def _with_pid(df: DataFrame, order_by: list[Column | str], num_partitions: int | None) -> DataFrame:
    """Range-partition by the sort key and stamp the partition id.

    The persist() is LOAD-BEARING for correctness, not a cache
    optimization: repartitionByRange SAMPLES its input to pick range
    bounds, and the kernel's two consumers (the per-partition
    counts/offsets job and the window job) otherwise each re-execute
    the exchange. When the input is larger than the sampler's
    reservoir (spark.sql.execution.rangeExchange.sampleSizePerPartition
    x partitions) AND the upstream row order is not stable across
    re-executions (e.g. a join followed by a hash aggregate), the two
    jobs can sample DIFFERENT bounds, assigning rows to different pids
    in each — silently corrupting every prefix offset. Persisting the
    pid-stamped relation materializes the sampled assignment exactly
    once; the offsets job populates the cache and the window job reads
    the identical rows. (Caught by the stats_ks_mannwhitney twin test;
    smaller or stably-ordered inputs never trip it, which is why 200+
    oracle checks passed before this input shape did not.)

    Lifecycle: registered as an ephemeral cache entry
    (operators/cache.py) — released by the harness AFTER the consuming
    query materializes, never before (releasing early would reintroduce
    the sampler hazard above)."""
    from . import cache

    n = num_partitions or df.sparkSession.sparkContext.defaultParallelism * 2
    return cache.ephemeral(
        df.repartitionByRange(n, *order_by).withColumn(_PID, F.spark_partition_id())
    )


def _prefix_offsets(per_pid: DataFrame, val_col: str) -> DataFrame:
    """Exclusive prefix sum over the per-partition totals relation.
    Triangular (b.pid < a.pid) self-join instead of a global window:
    the relation is one row per partition, so the join is O(P^2/2) on
    P <= a few thousand — and it never funnels data to one task."""
    a = per_pid.select(F.col(_PID).alias("a_pid"))
    b = per_pid.select(F.col(_PID).alias("b_pid"), F.col(val_col).alias("b_val"))
    return (
        a.join(b, F.col("b_pid") < F.col("a_pid"), "left")
        .groupBy("a_pid")
        .agg(F.sum("b_val").alias(_OFF))
        .select(F.col("a_pid").alias(_PID), _OFF)
    )


def distributed_row_number(
    df: DataFrame,
    order_by: list[Column | str],
    rn_col: str = "rn",
    total_col: str | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """df + a 1-based global row number by ``order_by`` (which must be a
    total order — include a unique tiebreak column), computed without a
    single-partition window. Optionally also attaches the total row
    count as ``total_col`` (from the same per-partition counts — no
    COUNT() OVER () global window)."""
    part = _with_pid(df, order_by, num_partitions)
    counts = part.groupBy(_PID).agg(F.count("*").alias("__rk_cnt"))
    offsets = _prefix_offsets(counts, "__rk_cnt")
    local = part.withColumn(
        _LOCAL, F.row_number().over(Window.partitionBy(_PID).orderBy(*order_by))
    )
    out = local.join(F.broadcast(offsets), _PID, "left").withColumn(
        rn_col,
        (F.coalesce(F.col(_OFF), F.lit(0)) + F.col(_LOCAL)).cast("bigint"),
    )
    if total_col is not None:
        tot = counts.agg(F.sum("__rk_cnt").cast("bigint").alias(total_col))
        out = out.crossJoin(F.broadcast(tot))
    return out.drop(_PID, _LOCAL, _OFF)


def distributed_cumsum(
    df: DataFrame,
    order_by: list[Column | str],
    value: Column,
    cum_col: str = "cum",
    num_partitions: int | None = None,
) -> DataFrame:
    """df + the running sum of ``value`` in ``order_by`` order (ROWS
    UNBOUNDED PRECEDING .. CURRENT ROW), two-pass distributed. Pass an
    exact-typed ``value`` (decimal or integer — catalog.py discipline):
    partial per-partition sums and the offset addition must be
    order-independent for the result to be engine-exact."""
    part = _with_pid(df, order_by, num_partitions)
    totals = part.groupBy(_PID).agg(F.sum(value).alias("__rk_tot"))
    offsets = _prefix_offsets(totals, "__rk_tot")
    w = (
        Window.partitionBy(_PID)
        .orderBy(*order_by)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = part.withColumn(_LOCAL, F.sum(value).over(w))
    return (
        local.join(F.broadcast(offsets), _PID, "left")
        .withColumn(
            cum_col,
            F.coalesce(F.col(_OFF), F.lit(0)) + F.col(_LOCAL),
        )
        .drop(_PID, _LOCAL, _OFF)
    )


def distributed_cummin_exclusive(
    df: DataFrame,
    order_by: list[Column | str],
    value: Column,
    out_col: str = "cummin_excl",
    num_partitions: int | None = None,
) -> DataFrame:
    """df + the minimum of ``value`` over all STRICTLY PRECEDING rows in
    ``order_by`` order (NULL for the global first row — an empty prefix
    has no minimum), two-pass distributed like the rank/cumsum kernels:
    range-partition on the sort key, per-partition exclusive-prefix min
    (ROWS UNBOUNDED PRECEDING .. 1 PRECEDING), then fold in the min of
    all preceding partitions via the triangular offsets join. min() is
    order-independent, so unlike cumsum no exact-type discipline is
    needed — doubles are fine. The skyline operator builds on this."""
    part = _with_pid(df, order_by, num_partitions)
    totals = part.groupBy(_PID).agg(F.min(value).alias("__rk_min"))
    a = totals.select(F.col(_PID).alias("a_pid"))
    b = totals.select(F.col(_PID).alias("b_pid"), F.col("__rk_min").alias("b_val"))
    offsets = (
        a.join(b, F.col("b_pid") < F.col("a_pid"), "left")
        .groupBy("a_pid")
        .agg(F.min("b_val").alias(_OFF))
        .select(F.col("a_pid").alias(_PID), _OFF)
    )
    w = (
        Window.partitionBy(_PID)
        .orderBy(*order_by)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = part.withColumn(_LOCAL, F.min(value).over(w))
    return (
        local.join(F.broadcast(offsets), _PID, "left")
        # least() skips NULLs (empty local prefix / no preceding
        # partition), yielding NULL only when both are absent
        .withColumn(out_col, F.least(F.col(_LOCAL), F.col(_OFF)))
        .drop(_PID, _LOCAL, _OFF)
    )
