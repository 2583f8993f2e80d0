"""Delivery-semantics tests: mid-stream stop/resume from checkpoint
(the engine's replacement for the reference's manual offset commits,
F1/F2) and dropDuplicatesWithinWatermark."""

from __future__ import annotations

import os
import time

from pyspark.sql import functions as F

from kafka_avro_order_processor_eg_4131_spark.functions.avro_ocf import ocf_encode
from kafka_avro_order_processor_eg_4131_spark.schemas import ORDER_AVRO_SCHEMA


def _write_envelope(spark, path, orders, offset0=0):
    rows = []
    for i, (oid, price) in enumerate(orders):
        blob = ocf_encode(
            ORDER_AVRO_SCHEMA, [{"orderId": oid, "product": "A B", "price": price}]
        )
        rows.append((oid.encode(), blob, "orders", 0, offset0 + i))
    spark.createDataFrame(
        rows, "key binary, value binary, topic string, partition int, offset long"
    ).coalesce(1).write.mode("append").parquet(path)


def test_stop_resume_no_duplicates(spark, tmp_path):
    """Process batch 1, stop, add batch 2, resume from the same
    checkpoint: batch 1 is NOT reprocessed (committed offsets), batch 2
    is — exactly the contract the reference's manual commit aims for,
    with batch granularity."""
    from kafka_avro_order_processor_eg_4131_spark.streaming.pipeline import (
        PipelineSinks,
        decode_orders,
        process_batch,
        route_orders,
    )

    src = str(tmp_path / "in")
    work = str(tmp_path / "work")
    sinks = PipelineSinks(
        success_dir=os.path.join(work, "success"),
        dlq_dir=os.path.join(work, "dlq"),
        retry_dir=os.path.join(work, "retry"),
        agg_dir=os.path.join(work, "agg"),
    )

    def run_once():
        envelope = spark.readStream.schema(
            "key binary, value binary, topic string, partition int, offset long"
        ).parquet(src)
        routed = route_orders(decode_orders(envelope))
        q = (
            routed.writeStream.foreachBatch(lambda df, b: process_batch(df, b, sinks))
            .option("checkpointLocation", os.path.join(work, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    _write_envelope(spark, src, [("r1-1", 100.0), ("r1-2", 200.0)])
    run_once()
    assert spark.read.parquet(sinks.success_dir).count() == 2

    time.sleep(1.2)
    _write_envelope(spark, src, [("r2-1", 300.0)], offset0=2)
    run_once()

    success = spark.read.parquet(sinks.success_dir)
    keys = sorted(bytes(r["key"]).decode() for r in success.collect())
    assert keys == ["r1-1", "r1-2", "r2-1"]  # no duplicates, nothing lost


def test_drop_duplicates_within_watermark_stream(spark, tmp_path):
    from kafka_avro_order_processor_eg_4131_spark.streaming.eventtime import (
        dedup_within_watermark,
    )

    src = str(tmp_path / "src")
    df = spark.createDataFrame(
        [
            (1, "2024-01-01 10:00:00", "click"),
            (1, "2024-01-01 10:00:30", "click"),   # duplicate event_id within watermark
            (2, "2024-01-01 10:01:00", "view"),
        ],
        "event_id long, ts_s string, event_type string",
    ).withColumn("ts", F.col("ts_s").cast("timestamp")).drop("ts_s")
    df.coalesce(1).write.parquet(src)

    stream = spark.readStream.schema("event_id long, event_type string, ts timestamp").parquet(src)
    deduped = dedup_within_watermark(stream, keys=["event_id"], watermark="10 minutes")
    q = (
        deduped.writeStream.format("memory")
        .queryName("dedup_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.table("dedup_stream").collect()
    assert sorted(r["event_id"] for r in rows) == [1, 2]
