"""Data-lake output patterns and event-time late-data policy:

- partitioned parquet writes -> partition pruning visible in the scan
  (PartitionFilters), the mechanism that turns a 100 TB scan into a
  one-partition read;
- watermarked streaming aggregation drops data later than the
  watermark (append mode) — the late-data policy of Phase 3.
"""

from __future__ import annotations

import time

from pyspark.sql import functions as F


def test_partitioned_write_and_partition_pruning(spark, sf_small, tmp_path):
    from kafka_avro_order_processor_eg_4131_spark.sources.tables import load_table

    orders = load_table(spark, sf_small, "orders").withColumn(
        "order_year", F.year("o_orderdate")
    )
    out = str(tmp_path / "orders_by_year")
    orders.write.partitionBy("order_year").parquet(out)

    back = spark.read.parquet(out).filter(F.col("order_year") == 1996)
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "order_year" in plan, plan[:2000]
    expected = orders.filter(F.col("order_year") == 1996).count()
    assert back.count() == expected
    # note: inputFiles() reports pre-pruning files; the PartitionFilters
    # assertion above is the pruning evidence


def test_watermark_drops_late_data(spark, tmp_path):
    """Watermark late-data policy (empirically pinned Spark semantics):
    a late row merging into STILL-LIVE state is accepted; once the
    watermark evicts the window's state, later rows for it are DROPPED
    (numRowsDroppedByWatermark) and the emitted result is final —
    append mode emits each window exactly once."""
    from kafka_avro_order_processor_eg_4131_spark.streaming.eventtime import tumbling_counts

    src = str(tmp_path / "src")

    def mk(rows):
        return (
            spark.createDataFrame(
                rows,
                "event_id long, ts_s string, user_id long, event_type string, "
                "value double, props string",
            )
            .withColumn("ts", F.col("ts_s").cast("timestamp"))
            .drop("ts_s")
        )

    batches = [
        [(1, "2024-01-01 10:00:00", 1, "click", 1.0, "{}"),
         (2, "2024-01-01 10:04:00", 1, "click", 1.0, "{}")],
        [(3, "2024-01-01 11:30:00", 2, "view", 1.0, "{}")],   # wm -> 11:20 for later batches
        [(4, "2024-01-01 11:31:00", 2, "view", 1.0, "{}")],   # evicts + emits the 10:00 window
        [(5, "2024-01-01 10:01:00", 3, "click", 1.0, "{}")],  # LATE: state already evicted
    ]
    for b in batches:
        mk(b).coalesce(1).write.mode("append").parquet(src)
        time.sleep(1.2)  # file-stream source orders batches by mtime

    stream = (
        spark.readStream.schema(
            "event_id long, user_id long, event_type string, value double, "
            "props string, ts timestamp"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    agg = tumbling_counts(stream, window="5 minutes", watermark="10 minutes")
    q = (
        agg.writeStream.format("memory")
        .queryName("late_data_windows")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    dropped = sum(
        op.get("numRowsDroppedByWatermark", 0)
        for p_ in q.recentProgress
        for op in p_.get("stateOperators", [])
    )
    assert dropped >= 1, [p_.get("stateOperators") for p_ in q.recentProgress]
    rows = {
        (str(r["window_start"]), r["event_type"]): r["n_events"]
        for r in spark.table("late_data_windows").collect()
    }
    # emitted exactly once, WITHOUT the dropped late row
    assert rows == {("2024-01-01 10:00:00", "click"): 2}, rows
