"""Streaming join tests: stream-static enrichment and the watermark-
bounded stream-stream join (clicks followed by purchases within 5
minutes)."""

from __future__ import annotations

from pyspark.sql import functions as F


def _write_events(spark, path, rows):
    (
        spark.createDataFrame(
            rows, "event_id long, ts_s string, user_id long, event_type string"
        )
        .withColumn("ts", F.col("ts_s").cast("timestamp"))
        .drop("ts_s")
        .coalesce(1)
        .write.mode("append")
        .parquet(path)
    )


def test_stream_static_enrichment(spark, sf_small, tmp_path):
    from kafka_avro_order_processor_eg_4131_spark.sources.tables import load_table
    from kafka_avro_order_processor_eg_4131_spark.streaming.joins import enrich_with_static

    src = str(tmp_path / "src")
    load_table(spark, sf_small, "events").limit(100).withColumn(
        "ts", F.col("ts").cast("timestamp")
    ).write.parquet(src)
    stream = spark.readStream.schema(
        "event_id long, user_id long, event_type string, value double, "
        "props string, ts timestamp"
    ).parquet(src)
    customers = load_table(spark, sf_small, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    enriched = enrich_with_static(stream, customers, "user_id")
    q = (
        enriched.writeStream.format("memory")
        .queryName("enriched_events")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.table("enriched_events").collect()
    assert rows and all(r["c_mktsegment"] is not None for r in rows)


def test_stream_stream_left_outer_emits_unmatched_after_watermark(spark, tmp_path):
    """Left-outer stream-stream join: clicks with no purchase within the
    bound emit with null right columns once the watermark passes their
    join window. Watermark progression is driven by a second batch of
    much-later sentinel rows (maxFilesPerTrigger=1 keeps the batches
    ordered)."""
    import time

    from kafka_avro_order_processor_eg_4131_spark.streaming.joins import (
        stream_stream_within,
    )

    clicks_dir = str(tmp_path / "clicks")
    buys_dir = str(tmp_path / "buys")
    _write_events(spark, clicks_dir, [
        (1, "2024-01-01 10:00:00", 7, "click"),   # matched by buy 101
        (2, "2024-01-01 10:10:00", 8, "click"),   # never matched -> null row
    ])
    _write_events(spark, buys_dir, [
        (101, "2024-01-01 10:03:00", 7, "purchase"),
    ])
    time.sleep(1.1)  # distinct mtimes so the sentinel files form batch 2
    # sentinels push the watermark (10 min delay) far past every bound
    _write_events(spark, clicks_dir, [(99, "2024-01-01 12:00:00", 99, "click")])
    _write_events(spark, buys_dir, [(199, "2024-01-01 12:00:00", 98, "purchase")])

    schema = "event_id long, user_id long, event_type string, ts timestamp"
    clicks = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(
        clicks_dir
    )
    buys = spark.readStream.schema(schema).parquet(buys_dir)
    joined = stream_stream_within(clicks, buys, key="user_id", how="leftOuter").select(
        F.col("l.event_id").alias("click_id"),
        F.col("r.event_id").alias("buy_id"),
    )
    q = (
        joined.writeStream.format("memory")
        .queryName("click_buys_outer")
        .option("checkpointLocation", str(tmp_path / "ck_outer"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r["click_id"], r["buy_id"])
        for r in spark.table("click_buys_outer").collect()
    }
    assert (1, 101) in got, got            # matched pair
    assert (2, None) in got, got           # unmatched left, emitted via outer path


def test_stream_stream_join_within_bound(spark, tmp_path):
    from kafka_avro_order_processor_eg_4131_spark.streaming.joins import stream_stream_within

    clicks_dir = str(tmp_path / "clicks")
    buys_dir = str(tmp_path / "buys")
    _write_events(spark, clicks_dir, [
        (1, "2024-01-01 10:00:00", 7, "click"),
        (2, "2024-01-01 10:10:00", 7, "click"),
        (3, "2024-01-01 10:00:00", 9, "click"),
    ])
    _write_events(spark, buys_dir, [
        (101, "2024-01-01 10:03:00", 7, "purchase"),   # within 5m of click 1
        (102, "2024-01-01 10:20:00", 7, "purchase"),   # within nothing (>= 10:15)
        (103, "2024-01-01 10:04:59", 9, "purchase"),   # within 5m of click 3
    ])
    schema = "event_id long, user_id long, event_type string, ts timestamp"
    clicks = spark.readStream.schema(schema).parquet(clicks_dir)
    buys = spark.readStream.schema(schema).parquet(buys_dir)
    joined = stream_stream_within(clicks, buys, key="user_id").select(
        F.col("l.event_id").alias("click_id"),
        F.col("r.event_id").alias("buy_id"),
    )
    q = (
        joined.writeStream.format("memory")
        .queryName("click_buys")
        .option("checkpointLocation", str(tmp_path / "ck2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    pairs = sorted((r["click_id"], r["buy_id"]) for r in spark.table("click_buys").collect())
    assert pairs == [(1, 101), (3, 103)], pairs
