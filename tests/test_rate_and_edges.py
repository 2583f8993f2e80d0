"""Rate-source streaming generator and envelope edge cases (null key —
the reference guards None keys at consumer.py:235)."""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from kafka_avro_order_processor_eg_4131_spark.functions.avro_ocf import ocf_encode
from kafka_avro_order_processor_eg_4131_spark.schemas import ORDER_AVRO_SCHEMA


def test_rate_source_stream_generates_orders(spark, tmp_path):
    from kafka_avro_order_processor_eg_4131_spark.functions.routing import status_expr
    from kafka_avro_order_processor_eg_4131_spark.sources.generator import (
        synthetic_orders,
        synthetic_orders_stream,
    )

    stream = synthetic_orders_stream(spark, rows_per_second=200)
    routed = stream.withColumn("status", status_expr(F.col("price")))
    q = (
        routed.writeStream.format("memory")
        .queryName("rate_orders")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .start()
    )
    try:
        deadline = time.time() + 30
        while time.time() < deadline:
            if spark.table("rate_orders").count() >= 100:
                break
            time.sleep(0.5)
        rows = spark.table("rate_orders").collect()
    finally:
        q.stop()
    assert len(rows) >= 100
    assert {r["status"] for r in rows} <= {
        "success", "transient_failure", "permanent_failure"
    }
    # stream twin determinism: same id -> same order as the batch generator
    batch = {r["orderId"]: r for r in synthetic_orders(spark, n=50).collect()}
    stream_by_id = {r["orderId"]: r for r in rows}
    overlap = set(batch) & set(stream_by_id)
    assert overlap, "expected shared ids between batch and rate-stream twins"
    for oid in overlap:
        assert batch[oid]["product"] == stream_by_id[oid]["product"]
        assert batch[oid]["price"] == stream_by_id[oid]["price"]


def test_pipeline_handles_null_key(spark, tmp_path):
    """Reference consumer.py:235: message keys can be None — the pipeline
    must route such records normally and the DLQ must preserve the null."""
    from kafka_avro_order_processor_eg_4131_spark.streaming.pipeline import run_order_pipeline

    blob_ok = ocf_encode(
        ORDER_AVRO_SCHEMA, [{"orderId": "nk-1", "product": "A B", "price": 700.0}]
    )
    blob_dlq = ocf_encode(
        ORDER_AVRO_SCHEMA, [{"orderId": "nk-2", "product": "C D", "price": 1500.0}]
    )
    df = spark.createDataFrame(
        [(None, blob_ok, "orders", 0, 0), (None, blob_dlq, "orders", 0, 1)],
        "key binary, value binary, topic string, partition int, offset long",
    )
    src = str(tmp_path / "in")
    df.coalesce(1).write.parquet(src)
    sinks = run_order_pipeline(spark, src, str(tmp_path / "work"))
    assert spark.read.parquet(sinks.success_dir).count() == 1
    dlq = spark.read.parquet(sinks.dlq_dir).collect()
    assert len(dlq) == 1
    assert dlq[0]["key"] is None  # original (null) key preserved
    hdrs = {h["key"]: bytes(h["value"]) for h in dlq[0]["headers"]}
    assert hdrs["error_reason"] == b"Price exceeds threshold: 1500.00 > 1000.0"
