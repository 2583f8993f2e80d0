"""Property tests for the router (SURVEY.md §5.2): for any float32
price, the Spark when-chain must agree with a direct Python transcription
of the reference's live branch logic (consumer.py:249-270), including
the closed [5,50] interval and the strict >1000 threshold."""

from __future__ import annotations

import struct

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from kafka_avro_order_processor_eg_4131_spark.functions.routing import status_expr


def reference_status(price) -> str:
    # consumer.py:249-270, live path
    if price is None:
        return "permanent_failure"
    if 5.0 <= price <= 50.0:
        return "transient_failure"
    if price > 1000.0:
        return "permanent_failure"
    return "success"


def f32(x: float) -> float:
    return struct.unpack("<f", struct.pack("<f", x))[0]


# boundary-heavy strategy: exact cut points, float32 neighbors, randoms
prices = st.one_of(
    st.sampled_from(
        [5.0, 50.0, 1000.0, 4.999999, 5.000001, 49.999996, 50.000004, 1000.0001, 0.0]
    ),
    st.floats(min_value=0.0, max_value=2000.0, allow_nan=False, width=32),
    st.none(),
)


@given(st.lists(prices, min_size=1, max_size=50))
@settings(max_examples=30, deadline=None)
def test_router_matches_reference_semantics(spark, batch):
    vals = [None if p is None else f32(p) for p in batch]
    df = spark.createDataFrame([(v,) for v in vals], "price float")
    got = [
        r["status"]
        for r in df.select(status_expr(F.col("price")).alias("status")).collect()
    ]
    want = [reference_status(v) for v in vals]
    assert got == want
