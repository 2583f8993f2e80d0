"""Benchmark harness: runs the catalog's headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

Each query is timed end-to-end including the action that materializes
it (count of the result — forces full execution without driver-side
collect of wide rows).
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    repo_root = os.path.dirname(os.path.abspath(__file__))
    if repo_root not in sys.path:
        sys.path.insert(0, repo_root)

    from kafka_avro_order_processor_eg_4131_spark.catalog import REGISTRY
    from kafka_avro_order_processor_eg_4131_spark.session import get_spark

    spark = get_spark(app_name="engine-bench")

    # warm the JVM + parquet footers once so per-query numbers measure the
    # queries, not session bootstrap
    spark.read.parquet(os.path.join(sf_dir, "orders.parquet")).count()

    # warm the Python worker pool + Arrow serialization path too —
    # otherwise the first pandas-UDF query is charged ~1-2 s of
    # per-executor worker spawn that belongs to the session, not the query
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf

    _noop = pandas_udf(lambda s: s, "long")
    spark.range(spark.sparkContext.defaultParallelism * 2).repartition(
        spark.sparkContext.defaultParallelism
    ).select(_noop(F.col("id"))).count()

    # the Arrow-eval path (struct serialization, JVM Arrow writers, JIT of
    # the hot loops) only fully warms under volume — run the real codec
    # UDFs over a synthetic 150k-row stream so that one-time session cost
    # isn't charged to the first codec query
    from kafka_avro_order_processor_eg_4131_spark.functions.avro_ocf import (
        ocf_decode_udf,
        ocf_encode_udf,
    )
    from kafka_avro_order_processor_eg_4131_spark.schemas import (
        ORDER_AVRO_SCHEMA_JSON,
    )
    from kafka_avro_order_processor_eg_4131_spark.shipping import ship_package

    ship_package(spark)
    _enc = ocf_encode_udf(ORDER_AVRO_SCHEMA_JSON)
    _dec = ocf_decode_udf(
        ORDER_AVRO_SCHEMA_JSON, "orderId string, product string, price float"
    )
    spark.range(150_000).repartition(
        spark.sparkContext.defaultParallelism
    ).select(
        _dec(
            _enc(
                F.struct(
                    F.col("id").cast("string").alias("orderId"),
                    F.lit("warm product").alias("product"),
                    (F.col("id") % 1495 + 5).cast("float").alias("price"),
                )
            )
        ).alias("o")
    ).select(F.sum("o.price")).collect()

    timings: dict[str, float] = {}
    t_total0 = time.perf_counter()
    for name, q in sorted(REGISTRY.items()):
        t0 = time.perf_counter()
        try:
            df = q.fn(spark, sf_dir)
            df.count()
            timings[name] = round(time.perf_counter() - t0, 4)
        except Exception as exc:  # a broken query shouldn't hide the rest
            timings[name] = -1.0
            print(f"BENCH ERROR {name}: {exc}", file=sys.stderr)
    total = round(time.perf_counter() - t_total0, 4)

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "catalog_total_runtime",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
