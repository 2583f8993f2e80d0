"""Streaming event-time operators vs their batch twins: the streaming
session/sliding aggregations over a bounded file stream must equal the
batch-mode computation on the same data (complete/availableNow)."""

from __future__ import annotations

from pyspark.sql import functions as F


def _events_stream(spark, sf_dir, tmp_path):
    from kafka_avro_order_processor_eg_4131_spark.sources.tables import load_table

    src = str(tmp_path / "events_src")
    load_table(spark, sf_dir, "events").withColumn(
        "ts", F.col("ts").cast("timestamp")
    ).write.parquet(src)
    return spark.readStream.schema(
        "event_id long, user_id long, event_type string, value double, "
        "props string, ts timestamp"
    ).parquet(src)


def test_streaming_tumbling_equals_batch(spark, sf_small, tmp_path):
    from kafka_avro_order_processor_eg_4131_spark.streaming.eventtime import tumbling_counts
    from kafka_avro_order_processor_eg_4131_spark.sources.tables import load_table

    stream = _events_stream(spark, sf_small, tmp_path)
    q = (
        tumbling_counts(stream)
        .writeStream.format("memory")
        .queryName("stream_tumble")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ck1"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (str(r["window_start"]), r["event_type"]): r["n_events"]
        for r in spark.table("stream_tumble").collect()
    }
    batch = (
        load_table(spark, sf_small, "events")
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .groupBy(F.window("ts", "5 minutes").alias("w"), "event_type")
        .agg(F.count("*").alias("n"))
        .collect()
    )
    want = {(str(r["w"]["start"]), r["event_type"]): r["n"] for r in batch}
    assert got == want


def test_streaming_session_equals_batch(spark, sf_small, tmp_path):
    from kafka_avro_order_processor_eg_4131_spark.streaming.eventtime import session_counts
    from kafka_avro_order_processor_eg_4131_spark.sources.tables import load_table

    stream = _events_stream(spark, sf_small, tmp_path)
    q = (
        session_counts(stream, gap="2 hours")
        .writeStream.format("memory")
        .queryName("stream_sessions")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ck2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r["user_id"], str(r["session_start"])): r["n_events"]
        for r in spark.table("stream_sessions").collect()
    }
    batch = (
        load_table(spark, sf_small, "events")
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .groupBy(F.session_window("ts", "2 hours").alias("w"), "user_id")
        .agg(F.count("*").alias("n"))
        .collect()
    )
    want = {(r["user_id"], str(r["w"]["start"])): r["n"] for r in batch}
    assert got == want
