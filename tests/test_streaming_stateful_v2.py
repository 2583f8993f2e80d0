"""transformWithStateInPandas (Spark 4 stateful API) twin.

The TransformWithState python runtime needs google.protobuf (its state
protocol is a protobuf socket), which this container does not ship —
so the trajectory/restart tests skip unless ``twsip_available()``, and
a gate test pins the exact failure mode so a future container upgrade
flips the suite on automatically. The executable coverage of the same
accumulator semantics lives in test_streaming_stateful.py
(applyInPandasWithState)."""

from __future__ import annotations

import pytest

from kafka_avro_order_processor_eg_4131_spark.streaming.stateful_v2 import (
    RunningOrderStatsProcessor,
    twsip_available,
)

BATCHES = [
    [("success", 100.0), ("transient_failure", 30.0), ("permanent_failure", 1200.0)],
    [("success", 200.0), ("success", 55.5)],
    [("transient_failure", 10.0), ("success", 999.99), ("permanent_failure", 2000.0)],
]


def test_gate_reflects_environment():
    """The availability gate must agree with reality: this container has
    no protobuf, so the gate is False (if a future image adds it, this
    flips and the skipped tests below activate)."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        has_pb = True
    except Exception:
        has_pb = False
    assert twsip_available() == has_pb


def test_processor_logic_exact_cents_pandas_twin():
    """The processor's per-batch arithmetic, driven directly with pandas
    frames and a fake ValueState — the handleInputRows contract tested
    without the gated runtime."""
    import pandas as pd

    class FakeState:
        def __init__(self):
            self._v = None

        def exists(self):
            return self._v is not None

        def get(self):
            return self._v

        def update(self, v):
            self._v = v

    class FakeHandle:
        def __init__(self):
            self.state = FakeState()

        def getValueState(self, name, schema):
            return self.state

    proc = RunningOrderStatsProcessor()
    handle = FakeHandle()
    proc.init(handle)

    expected_msg = expected_ord = expected_cents = 0
    for batch in BATCHES:
        pdf = pd.DataFrame(batch, columns=["status", "price"])
        [out] = list(proc.handleInputRows(("global",), iter([pdf]), None))
        expected_msg += len(batch)
        for status, price in batch:
            if status == "success":
                expected_ord += 1
                expected_cents += int(price * 100 + 0.5)
        row = out.iloc[0]
        assert row["message_count"] == expected_msg
        assert row["order_count"] == expected_ord
        assert row["total_price"] == expected_cents / 100.0  # exact, no drift
    assert handle.state.get() == (expected_msg, expected_ord, expected_cents)
    proc.close()


@pytest.fixture()
def stream_dir(spark, tmp_path):
    path = str(tmp_path / "in")
    for batch in BATCHES:
        spark.createDataFrame(batch, "status string, price double").coalesce(
            1
        ).write.mode("append").parquet(path)
    return path


@pytest.mark.skipif(not twsip_available(), reason="google.protobuf absent")
def test_twsip_trajectory_and_exact_totals(spark, tmp_path, stream_dir):
    from kafka_avro_order_processor_eg_4131_spark.streaming.stateful_v2 import (
        running_order_stats_v2,
    )

    src = (
        spark.readStream.schema("status string, price double")
        .option("maxFilesPerTrigger", 1)
        .parquet(stream_dir)
    )
    out = running_order_stats_v2(src)
    q = (
        out.writeStream.format("memory")
        .queryName("twsip_stats")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    rows = sorted(
        spark.sql("SELECT * FROM twsip_stats").collect(),
        key=lambda r: r["message_count"],
    )
    assert len(rows) == 3
    exp = []
    msg = ordn = cents = 0
    for batch in BATCHES:
        msg += len(batch)
        for status, price in batch:
            if status == "success":
                ordn += 1
                cents += int(price * 100 + 0.5)
        exp.append((msg, ordn, cents / 100.0))
    got = [(r["message_count"], r["order_count"], r["total_price"]) for r in rows]
    assert got == exp
