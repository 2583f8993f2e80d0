"""Join operators Spark lacks as built-ins (SURVEY.md §2.7: range/as-of).

The as-of join uses the union-sort technique rather than a naive
``join + groupBy max`` so it scales: one shuffle on the join key, one
sort per partition, no O(n*m) intermediate. This is the standard
formulation for "latest value at or before t" over big data:

  1. tag right rows (the quotes) and left rows (the probes),
  2. union them on (key, time),
  3. sort within key by (time, right-before-left) and carry the last
     non-null right-hand payload forward with a window function,
  4. keep only left rows.

Cost at 100 TB: a single hash exchange on the key + per-partition sort
— the same shape as a sort-merge join, with no blow-up on skewed keys
(the window is order-preserving, not pair-generating).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str,
    right_time: str,
    payload: list[str],
    how: str = "left",
) -> DataFrame:
    """For each left row, attach the payload of the latest right row with
    ``right[on] == left[on]`` and ``right[right_time] <= left[left_time]``.

    Deterministic: if several right rows share the max ``right_time`` for
    a key, the one with the greatest payload tuple (ordered by the
    ``payload`` columns, last wins) is taken — callers wanting a specific
    winner should pre-deduplicate ``right`` on (on, right_time).
    """
    lcols = left.columns
    tagged_r = right.select(
        F.col(on).alias("__k"),
        F.col(right_time).alias("__t"),
        F.lit(0).alias("__side"),  # right sorts before left at equal time
        F.struct(*[F.col(c) for c in payload]).alias("__payload"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols],
    )
    tagged_l = left.select(
        F.col(on).alias("__k"),
        F.col(left_time).alias("__t"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(tagged_r.schema["__payload"].dataType).alias("__payload"),
        *lcols,
    )
    w = (
        Window.partitionBy("__k")
        .orderBy("__t", "__side", "__payload")  # payload in the sort makes ties deterministic
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = tagged_r.unionByName(tagged_l).withColumn(
        "__asof", F.last("__payload", ignorenulls=True).over(w)
    )
    out = carried.filter(F.col("__side") == 1).select(
        *lcols,
        *[F.col("__asof").getField(c).alias(c) for c in payload],
    )
    if how == "inner":
        out = out.filter(F.col(payload[0]).isNotNull())
    return out
