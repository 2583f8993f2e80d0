"""Multi-batch streaming tests: the aggregate trajectory across batch
boundaries matches the reference's per-message trajectory sampled at
the same points (SURVEY.md §5.2), and applyInPandasWithState keeps the
accumulators across batches."""

from __future__ import annotations

import struct

import pytest

from kafka_avro_order_processor_eg_4131_spark.functions.avro_ocf import ocf_encode
from kafka_avro_order_processor_eg_4131_spark.schemas import ORDER_AVRO_SCHEMA

BATCHES = [
    # (orderId, price) — three batches with known per-batch outcomes
    [("a-1", 100.0), ("a-2", 30.0), ("a-3", 1200.0)],   # success / transient / permanent
    [("b-1", 200.0), ("b-2", 55.5)],                     # success / success
    [("c-1", 10.0), ("c-2", 999.99), ("c-3", 2000.0)],   # transient / success / permanent
]


def f32(x):
    return struct.unpack("<f", struct.pack("<f", x))[0]


@pytest.fixture()
def batch_dirs(spark, tmp_path):
    """One parquet file per batch; maxFilesPerTrigger=1 turns them into
    three micro-batches in order."""
    path = str(tmp_path / "in")
    offset = 0
    for i, batch in enumerate(BATCHES):
        rows = []
        for oid, price in batch:
            blob = ocf_encode(
                ORDER_AVRO_SCHEMA, [{"orderId": oid, "product": "X Y", "price": price}]
            )
            rows.append((oid.encode(), blob, "orders", 0, offset))
            offset += 1
        df = spark.createDataFrame(
            rows, "key binary, value binary, topic string, partition int, offset long"
        )
        df.coalesce(1).write.mode("append").parquet(path)
    return path


def test_agg_trajectory_across_batches(spark, tmp_path, batch_dirs):
    """Cumulative (order_count, total_price) after each batch must equal
    the reference's accumulators sampled at those message indices."""
    from kafka_avro_order_processor_eg_4131_spark.streaming.pipeline import (
        PipelineSinks,
        decode_orders,
        process_batch,
        route_orders,
    )
    import os

    work = str(tmp_path / "work")
    sinks = PipelineSinks(
        success_dir=os.path.join(work, "success"),
        dlq_dir=os.path.join(work, "dlq"),
        retry_dir=os.path.join(work, "retry"),
        agg_dir=os.path.join(work, "agg"),
    )
    envelope = (
        spark.readStream.schema(
            "key binary, value binary, topic string, partition int, offset long"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(batch_dirs)
    )
    routed = route_orders(decode_orders(envelope))
    q = (
        routed.writeStream.foreachBatch(lambda df, bid: process_batch(df, bid, sinks))
        .option("checkpointLocation", os.path.join(work, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    agg = sorted(
        spark.read.parquet(sinks.agg_dir).collect(), key=lambda r: r["batch_id"]
    )
    assert len(agg) == 3
    # per-batch success contributions (float32-decoded)
    per_batch = [
        (1, f32(100.0)),
        (2, f32(200.0) + f32(55.5)),
        (1, f32(999.99)),
    ]
    running_n, running_total = 0, 0.0
    for row, (n, total) in zip(agg, per_batch):
        assert row["order_count"] == n
        assert abs(row["total_price"] - total) < 1e-9
        running_n += n
        running_total += total
    assert running_n == 4
    # and the final totals match the whole-stream reference computation
    assert abs(running_total - (f32(100.0) + f32(200.0) + f32(55.5) + f32(999.99))) < 1e-9


def test_stateful_running_accumulators(spark, tmp_path, batch_dirs):
    """applyInPandasWithState keeps the accumulators ACROSS batches —
    the last emitted row equals the reference's final summary
    (consumer.py:194-206)."""
    from kafka_avro_order_processor_eg_4131_spark.streaming.pipeline import (
        decode_orders,
        route_orders,
    )
    from kafka_avro_order_processor_eg_4131_spark.streaming.stateful import (
        running_order_stats,
    )

    envelope = (
        spark.readStream.schema(
            "key binary, value binary, topic string, partition int, offset long"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(batch_dirs)
    )
    stats = running_order_stats(route_orders(decode_orders(envelope)))
    out = []
    q = (
        stats.writeStream.foreachBatch(lambda df, bid: out.append((bid, df.collect())))
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    rows = [r for _, batch in sorted(out) for r in batch]
    assert len(rows) == 3
    final = rows[-1]
    assert final["message_count"] == 8
    assert final["order_count"] == 4
    expected_total = f32(100.0) + f32(200.0) + f32(55.5) + f32(999.99)
    assert abs(final["total_price"] - expected_total) < 1e-9
    assert abs(final["running_average"] - expected_total / 4) < 1e-9
    # trajectory is monotone in message_count: batch boundaries 3, 5, 8
    assert [r["message_count"] for r in rows] == [3, 5, 8]
