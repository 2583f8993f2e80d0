"""Batch-split invariance of the flagship pipeline (round-5 depth):
the routed multi-sink output must not depend on how the envelope
stream is chopped into micro-batches — one trigger for everything vs
one trigger per input file must yield identical success/retry rows,
identical DLQ records (modulo the wall-clock timestamp header), and
identical aggregate totals. This is the delivery-semantics analogue of
the shuffle-partition invariance tests for the batch kernels."""

from __future__ import annotations

import pytest

from kafka_avro_order_processor_eg_4131_spark.functions.avro_ocf import ocf_encode
from kafka_avro_order_processor_eg_4131_spark.schemas import ORDER_AVRO_SCHEMA
from kafka_avro_order_processor_eg_4131_spark.streaming.pipeline import (
    run_order_pipeline,
)

# every band: success / transient closed bounds / strict-> permanent /
# corrupt; spread across 4 files so maxFilesPerTrigger=1 makes 4 batches
ORDERS = [
    ("s-01", "Amber", 4.99),
    ("s-02", "Basic", 5.0),
    ("s-03", "Cobalt", 50.0),
    ("s-04", "Delta", 60.0),
    ("s-05", "Ember", 999.99),
    ("s-06", "Fancy", 1000.0),
    ("s-07", "Giant", 1000.01),
    ("s-08", "Hyper", 1499.99),
    ("s-09", "Ivory", 25.0),
    ("s-10", "Jolly", 0.01),
    ("s-11", "Kite", 777.0),
    ("s-12", "Lunar", 1200.5),
]


@pytest.fixture()
def split_envelope_dir(spark, tmp_path):
    path = str(tmp_path / "input")
    for chunk in range(4):
        rows = []
        for i, (oid, product, price) in enumerate(ORDERS[chunk * 3:(chunk + 1) * 3]):
            blob = ocf_encode(
                ORDER_AVRO_SCHEMA,
                [{"orderId": oid, "product": product, "price": price}],
            )
            rows.append((oid.encode(), blob, "orders", chunk, chunk * 3 + i))
        if chunk == 3:
            rows.append((b"corrupt", b"junk-bytes", "orders", chunk, 99))
        spark.createDataFrame(
            rows, "key binary, value binary, topic string, partition int, offset long"
        ).coalesce(1).write.mode("append").parquet(path)
    return path


def _canon_plain(spark, d):
    return sorted(
        (bytes(r["key"]), bytes(r["value"]), r["topic"], r["partition"], r["offset"])
        for r in spark.read.parquet(d).collect()
    )


def _canon_dlq(spark, d):
    out = []
    for r in spark.read.parquet(d).collect():
        hdrs = tuple(
            (h["key"], bytes(h["value"]))
            for h in r["headers"]
            if h["key"] != "timestamp"  # wall-clock — legitimately varies
        )
        out.append((bytes(r["key"]), bytes(r["value"]), hdrs))
    return sorted(out)


def test_sink_contents_invariant_under_micro_batch_splits(spark, tmp_path, split_envelope_dir):
    one = run_order_pipeline(spark, split_envelope_dir, str(tmp_path / "one"))
    per_file = run_order_pipeline(
        spark,
        split_envelope_dir,
        str(tmp_path / "many"),
        max_files_per_trigger=1,
    )

    assert _canon_plain(spark, one.success_dir) == _canon_plain(spark, per_file.success_dir)
    assert _canon_plain(spark, one.retry_dir) == _canon_plain(spark, per_file.retry_dir)
    assert _canon_dlq(spark, one.dlq_dir) == _canon_dlq(spark, per_file.dlq_dir)

    def totals(d):
        r = spark.read.parquet(d).groupBy().sum("order_count", "total_price").collect()[0]
        return r[0], round(r[1], 9)

    assert totals(one.agg_dir) == totals(per_file.agg_dir)
    # the per-file run really did split: one batch per input file
    n_batches = spark.read.parquet(per_file.agg_dir).count()
    assert n_batches == 4
