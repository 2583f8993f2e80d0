"""Record shapes of the reference system, as Spark types.

The reference has exactly one logical record type, ``Order``
(reference order.avsc:1-19): three required fields
``orderId string / product string / price float``. ``price`` is Avro
``float`` = IEEE-754 32-bit, so the engine uses ``FloatType`` — the
float32 quantization of prices is semantically load-bearing for the
correctness oracle (SURVEY.md §1.2).

The Kafka message envelope (reference consumer.py:232-235) and the DLQ
record (consumer.py:90-105) are the two implicit schemas; they map 1:1
onto Spark's Kafka source/sink columns (SURVEY.md §1.3).
"""

from __future__ import annotations

import json

from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# --- Order (reference order.avsc:1-19) ------------------------------------

ORDER_SCHEMA = StructType(
    [
        StructField("orderId", StringType(), False),
        StructField("product", StringType(), False),
        StructField("price", FloatType(), False),
    ]
)

# Avro writer schema, verbatim semantics of reference order.avsc.
ORDER_AVRO_SCHEMA: dict = {
    "type": "record",
    "name": "Order",
    "namespace": "com.assignment",
    "fields": [
        {"name": "orderId", "type": "string"},
        {"name": "product", "type": "string"},
        {"name": "price", "type": "float"},
    ],
}

ORDER_AVRO_SCHEMA_JSON = json.dumps(ORDER_AVRO_SCHEMA)

# --- Kafka envelope (reference consumer.py:232-235; SURVEY.md §1.3) -------

KAFKA_HEADER_TYPE = StructType(
    [
        StructField("key", StringType(), False),
        StructField("value", BinaryType(), True),
    ]
)

KAFKA_ENVELOPE_SCHEMA = StructType(
    [
        StructField("key", BinaryType(), True),
        StructField("value", BinaryType(), True),
        StructField("topic", StringType(), True),
        StructField("partition", IntegerType(), True),
        StructField("offset", LongType(), True),
        StructField("timestamp", TimestampType(), True),
        StructField("headers", ArrayType(KAFKA_HEADER_TYPE), True),
    ]
)

# --- DLQ record (reference consumer.py:90-105; FIXTURES.md §3) ------------

DLQ_HEADER_KEYS = (
    "error_reason",
    "original_topic",
    "original_partition",
    "original_offset",
    "timestamp",
)

_AVRO_TO_SPARK = {
    "string": StringType(),
    "int": IntegerType(),
    "long": LongType(),
    "float": FloatType(),
    "double": None,  # filled below to avoid an import cycle in the table
    "boolean": None,
    "bytes": None,
}


def avro_schema_to_struct(schema: dict | str) -> StructType:
    """S2 (reference consumer.py:46-48 / producer.py:32-34): load a
    parsed .avsc record schema and derive the Spark StructType for the
    raw-struct path. Supports the primitive subset the OCF codec
    handles (functions/avro_ocf.py)."""
    import json as _json

    from pyspark.sql.types import BooleanType, DoubleType

    mapping = dict(_AVRO_TO_SPARK)
    mapping["double"] = DoubleType()
    mapping["boolean"] = BooleanType()
    mapping["bytes"] = BinaryType()

    s = _json.loads(schema) if isinstance(schema, str) else schema
    if s.get("type") != "record":
        raise ValueError(f"unsupported top-level Avro type {s.get('type')!r}")
    fields = []
    for f in s["fields"]:
        t = mapping.get(f["type"])
        if t is None:
            raise ValueError(f"unsupported Avro field type {f['type']!r}")
        fields.append(StructField(f["name"], t, False))
    return StructType(fields)


def load_avsc(path: str) -> tuple[str, StructType]:
    """Read an .avsc file (driver-side, once — like both reference
    programs at startup) -> (schema JSON string, StructType)."""
    import json as _json

    with open(path, encoding="utf-8") as fh:
        schema = _json.load(fh)
    return _json.dumps(schema), avro_schema_to_struct(schema)


# Routing statuses (reference consumer.py:253-270)
STATUS_SUCCESS = "success"
STATUS_TRANSIENT = "transient_failure"
STATUS_PERMANENT = "permanent_failure"

# Routing rule constants (reference consumer.py:15, 253, 259)
TRANSIENT_LOW = 5.0
TRANSIENT_HIGH = 50.0
PERMANENT_THRESHOLD = 1000.0
MAX_RETRIES = 3
