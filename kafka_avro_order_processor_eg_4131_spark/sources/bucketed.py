"""Bucketed tables: co-located joins without a shuffle.

At 100 TB the dominant cost of a fact-fact join is the exchange of both
sides on the join key. Writing both tables bucketed (``bucketBy(n, key)
.sortBy(key)``) pre-partitions them on disk; Spark's scan then reports
the hash distribution and the join planner drops both exchanges — the
join runs bucket-against-bucket. ``tests/test_bucketed.py`` asserts the
plan contains no Exchange.

Bucket-count guidance: pick n so each bucket of the LARGER table is
100-500 MB (e.g. 30 TB lineitem -> ~65k buckets); both sides must use
the same n and key for co-location.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    num_buckets: int = 8,
    mode: str = "overwrite",
) -> None:
    (
        df.write.mode(mode)
        .bucketBy(num_buckets, bucket_col)
        .sortBy(bucket_col)
        .format("parquet")
        .saveAsTable(table)
    )


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on, how: str = "inner"
) -> DataFrame:
    """``on`` may be a column name or a join Column expression."""
    return spark.table(left_table).join(spark.table(right_table), on, how)
