"""Redelivery paths: the retry branch's output is a valid envelope
stream — feeding it back through the pipeline reproduces the same
routing (F2's redelivery contract, minus the reference's lost-retry
bug); and DLQ values decode back to the original records so a human
(or a replayer) can reprocess them (consumer.py:101 preserves bytes)."""

from __future__ import annotations

import pytest

from kafka_avro_order_processor_eg_4131_spark.functions.avro_ocf import ocf_decode, ocf_encode
from kafka_avro_order_processor_eg_4131_spark.schemas import ORDER_AVRO_SCHEMA


@pytest.fixture()
def first_run(spark, tmp_path):
    from kafka_avro_order_processor_eg_4131_spark.streaming.pipeline import run_order_pipeline

    orders = [("t-1", 10.0), ("t-2", 42.0), ("s-1", 500.0), ("p-1", 1500.0)]
    rows = []
    for i, (oid, price) in enumerate(orders):
        blob = ocf_encode(
            ORDER_AVRO_SCHEMA, [{"orderId": oid, "product": "A B", "price": price}]
        )
        rows.append((oid.encode(), blob, "orders", 0, i))
    src = str(tmp_path / "in")
    spark.createDataFrame(
        rows, "key binary, value binary, topic string, partition int, offset long"
    ).coalesce(1).write.parquet(src)
    sinks = run_order_pipeline(spark, src, str(tmp_path / "work"))
    return sinks


def test_retry_branch_reconsumes_identically(spark, tmp_path, first_run):
    """The transient (retry) sink is itself a valid envelope source: a
    second pipeline over it routes every record transient again."""
    from kafka_avro_order_processor_eg_4131_spark.streaming.pipeline import run_order_pipeline

    retry = spark.read.parquet(first_run.retry_dir)
    assert retry.count() == 2
    sinks2 = run_order_pipeline(spark, first_run.retry_dir, str(tmp_path / "work2"))
    assert spark.read.parquet(sinks2.retry_dir).count() == 2
    # empty branches write no parquet files -> reading them must fail or be empty
    for d in (sinks2.success_dir, sinks2.dlq_dir):
        try:
            assert spark.read.parquet(d).count() == 0
        except Exception:
            pass  # no files written at all — also correct


def test_dlq_values_reprocess_to_original_records(spark, first_run):
    dlq = spark.read.parquet(first_run.dlq_dir).collect()
    assert len(dlq) == 1
    rec = ocf_decode(bytes(dlq[0]["value"]))
    assert rec["orderId"] == "p-1"
    assert abs(rec["price"] - 1500.0) < 1e-3
