"""Bucketed co-located join: both sides pre-bucketed on the join key =>
the physical plan has no Exchange (the shuffle the bucketing exists to
eliminate)."""

from __future__ import annotations

import pytest


@pytest.mark.slow
def test_bucketed_join_has_no_exchange(spark, sf_small, tmp_path):
    from kafka_avro_order_processor_eg_4131_spark.sources.bucketed import (
        bucketed_join,
        write_bucketed,
    )
    from kafka_avro_order_processor_eg_4131_spark.sources.tables import load_table

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        write_bucketed(
            load_table(spark, sf_small, "orders"), "orders_b", "o_custkey", 8
        )
        write_bucketed(
            load_table(spark, sf_small, "customer"), "customer_b", "c_custkey", 8
        )
        joined = bucketed_join(
            spark,
            "orders_b",
            "customer_b",
            on=spark.table("orders_b")["o_custkey"] == spark.table("customer_b")["c_custkey"],
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert joined.count() == load_table(spark, sf_small, "orders").count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        spark.sql("DROP TABLE IF EXISTS orders_b")
        spark.sql("DROP TABLE IF EXISTS customer_b")
