"""Custom Python DataSource (Spark 4 API): the synthetic-orders format
must produce rows bit-identical to the JVM expression generator, batch
reads must parallelize across InputPartitions, and the stream reader
must advance offsets and replay deterministically."""

from __future__ import annotations

import time

from pyspark.sql import functions as F


def _rows_by_id(df):
    return {r["orderId"]: (r["product"], r["price"]) for r in df.collect()}


def test_batch_matches_jvm_generator(spark):
    from kafka_avro_order_processor_eg_4131_spark.sources.generator import (
        synthetic_orders,
    )
    from kafka_avro_order_processor_eg_4131_spark.sources.python_datasource import (
        register_synthetic_source,
    )

    register_synthetic_source(spark)
    via_source = spark.read.format("synthetic_orders").option("n", 200).load()
    via_exprs = synthetic_orders(spark, 200)
    # nullability differs (expression metadata vs declared schema); the
    # type shape must match exactly
    assert via_source.schema.simpleString() == via_exprs.schema.simpleString()
    a, b = _rows_by_id(via_source), _rows_by_id(via_exprs)
    assert a == b  # same ids, same products, bit-identical float32 prices


def test_batch_partitions_split_the_range(spark):
    from kafka_avro_order_processor_eg_4131_spark.sources.python_datasource import (
        register_synthetic_source,
    )

    register_synthetic_source(spark)
    df = (
        spark.read.format("synthetic_orders")
        .option("n", 100)
        .option("numPartitions", 5)
        .load()
    )
    assert df.rdd.getNumPartitions() == 5
    assert df.count() == 100
    assert df.select("orderId").distinct().count() == 100


def test_stream_reader_advances_and_is_deterministic(spark, tmp_path):
    from kafka_avro_order_processor_eg_4131_spark.sources.python_datasource import (
        _order_tuple,
        register_synthetic_source,
    )

    register_synthetic_source(spark)
    stream = (
        spark.readStream.format("synthetic_orders")
        .option("rowsPerBatch", 25)
        .load()
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("synth_stream")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(processingTime="0 seconds")
        .start()
    )
    try:
        deadline = time.time() + 60
        while time.time() < deadline:
            if spark.table("synth_stream").count() >= 50:
                break
            time.sleep(0.5)
    finally:
        q.stop()
    got = {r["orderId"]: r["price"] for r in spark.table("synth_stream").collect()}
    assert len(got) >= 50
    # the emitted rows are exactly the deterministic prefix 0..n-1
    expected = dict(
        (t[0], t[2]) for t in (_order_tuple(i, 42) for i in range(len(got)))
    )
    assert set(got) == set(expected)
    import numpy as np

    sample = list(got)[:10]
    for oid in sample:
        # the source declares price float32; widen the double twin the same way
        assert got[oid] == float(np.float32(expected[oid]))


def test_source_feeds_routing_rules(spark):
    """The custom source slots into the engine's routing pipeline like
    any other relation (P3-P5 over generated orders)."""
    from kafka_avro_order_processor_eg_4131_spark.sources.python_datasource import (
        register_synthetic_source,
    )

    register_synthetic_source(spark)
    df = spark.read.format("synthetic_orders").option("n", 2000).load()
    routed = df.withColumn(
        "status",
        F.when(F.col("price").between(5.0, 50.0), "transient")
        .when(F.col("price") > 1000.0, "permanent")
        .otherwise("success"),
    )
    mix = {r["status"]: r["n"] for r in routed.groupBy("status").agg(F.count("*").alias("n")).collect()}
    # expected mix from BASELINE.md: ~3% transient, ~33.4% permanent
    assert 0.01 < mix.get("transient", 0) / 2000 < 0.06
    assert 0.28 < mix.get("permanent", 0) / 2000 < 0.39


def test_stream_reader_is_partition_parallel(spark, tmp_path):
    """The round-9 upgrade: the stream reader is the partition-parallel
    DataSourceStreamReader flavor — each microbatch's range splits into
    numPartitions executor-side sub-ranges (no driver-side row
    generation)."""
    from kafka_avro_order_processor_eg_4131_spark.sources.python_datasource import (
        _SyntheticOrdersStreamReader,
    )

    r = _SyntheticOrdersStreamReader({"rowsPerBatch": "25", "numPartitions": "3"})
    assert r.initialOffset() == {"next": 0}
    assert r.latestOffset() == {"next": 25}
    parts = r.partitions({"next": 0}, {"next": 25})
    assert [(p.start, p.end) for p in parts] == [(0, 9), (9, 18), (18, 25)]
    # read() is executor-side and a pure function of the range
    rows = [t for p in parts for t in r.read(p)]
    assert len(rows) == 25 and len({t[0] for t in rows}) == 25
    # empty range (restart replay of an already-planned batch edge)
    assert r.partitions({"next": 25}, {"next": 25}) == []


def test_stream_reader_restart_resumes_without_duplicates(spark, tmp_path):
    """Stop a query mid-stream and restart from its checkpoint: the
    resumed reader must learn the frontier from the engine's replay of
    the offset log's last batch (the _SimpleStreamReaderWrapper
    contract) and continue with NO duplicate and NO skipped row ids.
    Before the partitions()-frontier fix, a restart re-emitted every
    range while latestOffset() caught back up from 0 (measured: 100
    duplicate rows)."""
    import time

    from kafka_avro_order_processor_eg_4131_spark.sources.python_datasource import (
        _order_tuple,
        register_synthetic_source,
    )

    register_synthetic_source(spark)
    ck, out = str(tmp_path / "ck"), str(tmp_path / "out")

    def run_until(target_rows: int):
        stream = (
            spark.readStream.format("synthetic_orders")
            .option("rowsPerBatch", 25)
            .option("numPartitions", 3)
            .load()
        )
        q = (
            stream.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ck)
            .trigger(processingTime="0 seconds")
            .start()
        )
        try:
            deadline = time.time() + 90
            while time.time() < deadline:
                try:
                    if spark.read.parquet(out).count() >= target_rows:
                        break
                except Exception:
                    pass
                time.sleep(0.5)
        finally:
            q.stop()
        return spark.read.parquet(out).collect()

    n1 = len(run_until(50))
    assert n1 >= 50
    rows = run_until(n1 + 50)
    ids = [r["orderId"] for r in rows]
    assert len(ids) == len(set(ids)), "restart re-emitted committed ranges"
    id_of = {_order_tuple(i, 42)[0]: i for i in range(len(rows) + 500)}
    idx = sorted(id_of[i] for i in ids)
    assert idx == list(range(0, len(rows))), "row-id stream not contiguous"
