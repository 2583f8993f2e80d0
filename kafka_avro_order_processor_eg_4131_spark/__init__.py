"""PySpark-native analytics engine with the query and data-processing
capabilities of the reference Kafka/Avro order processor
(KavindaRajapaksha/kafka-avro-order-processor-eg-4131), rebuilt Spark-first.

Layout
------
- ``session``    : tuned SparkSession factory (AQE, Arrow, UTC)
- ``schemas``    : the Order record type (reference order.avsc:1-19),
                   Kafka envelope, DLQ record shapes
- ``sources``    : parquet table loaders, seeded synthetic order generator,
                   Kafka source/sink option builders (gated: no broker in CI)
- ``functions``  : routing/validation expressions, pure-Python Avro OCF codec,
                   text-analysis expressions, vector math expressions
- ``operators``  : relational operator library (joins/windows/setops/sorts/
                   aggregates), dedup (exact/MinHash-LSH/SimHash/Jaccard),
                   similarity search, multimodal column plumbing
- ``streaming``  : the flagship routed pipeline (foreachBatch multi-sink),
                   event-time windows, bounded-retry sink wrapper
- ``catalog``    : the query registry backing ``__spark_entry__.py`` —
                   every operator exposed as (spark_fn, oracle_sql) pairs
"""

__version__ = "0.1.0"
