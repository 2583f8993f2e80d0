"""Unit tests for operators/ranking.py — the two-pass distributed
rank/cumsum now underpins seven catalog queries, so its edge cases get
direct coverage: tie-free total orders, descending keys, skewed keys,
single-row and empty inputs, and bit-equality with the global-window
formulation."""

from __future__ import annotations

import random

import pytest

from pyspark.sql import Window
from pyspark.sql import functions as F

from kafka_avro_order_processor_eg_4131_spark.operators.ranking import (
    distributed_cumsum,
    distributed_row_number,
)


def _random_df(spark, n, seed, skew=False):
    rng = random.Random(seed)
    rows = []
    for i in range(n):
        k = rng.randint(0, 5) if skew and rng.random() < 0.7 else rng.randint(0, 1000)
        rows.append((i, k, rng.randint(-50, 50)))
    return spark.createDataFrame(rows, "id long, k long, v long")


def test_row_number_matches_global_window_asc_and_desc(spark):
    df = _random_df(spark, 500, seed=1)
    for order in ([F.col("k"), F.col("id")], [F.col("k").desc(), F.col("id")]):
        got = {
            r["id"]: r["rn"]
            for r in distributed_row_number(df, order, rn_col="rn").collect()
        }
        ref = {
            r["id"]: r["rn"]
            for r in df.withColumn(
                "rn", F.row_number().over(Window.orderBy(*order))
            ).collect()
        }
        assert got == ref


def test_row_number_total_and_skew(spark):
    df = _random_df(spark, 400, seed=2, skew=True)
    out = distributed_row_number(
        df, [F.col("k"), F.col("id")], rn_col="rn", total_col="n"
    ).collect()
    assert all(r["n"] == 400 for r in out)
    assert sorted(r["rn"] for r in out) == list(range(1, 401))


def test_row_number_tiny_inputs(spark):
    one = spark.createDataFrame([(7, 3)], "id long, k long")
    [r] = distributed_row_number(one, [F.col("k"), F.col("id")], rn_col="rn").collect()
    assert r["rn"] == 1
    empty = spark.createDataFrame([], "id long, k long")
    assert distributed_row_number(empty, [F.col("k")], rn_col="rn").count() == 0


def test_row_number_explicit_partition_counts(spark):
    df = _random_df(spark, 300, seed=3)
    for parts in (1, 2, 7, 64):
        got = sorted(
            r["rn"]
            for r in distributed_row_number(
                df, [F.col("k"), F.col("id")], rn_col="rn", num_partitions=parts
            ).collect()
        )
        assert got == list(range(1, 301))


def test_cumsum_matches_global_window_exact_ints(spark):
    df = _random_df(spark, 500, seed=4)
    got = {
        r["id"]: r["cum"]
        for r in distributed_cumsum(
            df, [F.col("k"), F.col("id")], F.col("v"), cum_col="cum"
        ).collect()
    }
    w = (
        Window.orderBy(F.col("k"), F.col("id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ref = {r["id"]: r["cum"] for r in df.withColumn("cum", F.sum("v").over(w)).collect()}
    assert got == ref


def test_cumsum_decimal_bit_exact(spark):
    rng = random.Random(5)
    rows = [(i, rng.randint(0, 100), round(rng.uniform(-10, 10), 4)) for i in range(300)]
    df = spark.createDataFrame(rows, "id long, k long, x double")
    val = F.col("x").cast("decimal(30,6)")
    got = {
        r["id"]: str(r["cum"])
        for r in distributed_cumsum(
            df, [F.col("k"), F.col("id")], val, cum_col="cum"
        ).collect()
    }
    w = (
        Window.orderBy(F.col("k"), F.col("id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ref = {
        r["id"]: str(r["cum"]) for r in df.withColumn("cum", F.sum(val).over(w)).collect()
    }
    assert got == ref


def test_cummin_exclusive_matches_global_window(spark):
    from kafka_avro_order_processor_eg_4131_spark.operators.ranking import (
        distributed_cummin_exclusive,
    )

    rng = random.Random(11)
    # duplicate keys on purpose: the exclusive frame must respect row
    # order under ties, and the first global row must come back NULL
    rows = [(i, rng.randint(0, 40), rng.uniform(-5, 5)) for i in range(500)]
    df = spark.createDataFrame(rows, "id long, k long, v double")
    got = {
        r["id"]: r["m"]
        for r in distributed_cummin_exclusive(
            df, [F.col("k"), F.col("id")], F.col("v"), out_col="m"
        ).collect()
    }
    w = (
        Window.orderBy(F.col("k"), F.col("id"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    ref = {r["id"]: r["m"] for r in df.withColumn("m", F.min("v").over(w)).collect()}
    assert got == ref
    assert sum(1 for v in got.values() if v is None) == 1


def test_cumsum_consistent_on_unstable_order_join_agg_input(spark, sf_small):
    """Regression: repartitionByRange SAMPLES its input per job; without
    the load-bearing persist in _with_pid, the offsets job and the
    window job could sample different bounds over a join+hash-agg input
    (whose row order is not stable across re-executions) and corrupt
    every prefix. This reproduces that input shape at above-reservoir
    row counts and twin-checks the cumsum, three times."""
    from kafka_avro_order_processor_eg_4131_spark.catalog import load
    from kafka_avro_order_processor_eg_4131_spark.operators.ranking import (
        distributed_cumsum,
    )
    from pyspark.sql import functions as F

    o = load(spark, sf_small, "orders")
    c = load(spark, sf_small, "customer").select("c_custkey", "c_mktsegment")
    j = o.join(c, F.col("o_custkey") == F.col("c_custkey")).select(
        F.floor(F.col("o_totalprice") * 100.0 + 0.5).cast("bigint").alias("k"),
        F.col("c_mktsegment").alias("seg"),
    )
    v = j.groupBy("k").agg(
        F.count("*").alias("n"),
        F.sum(F.when(F.col("seg") == "BUILDING", 1).otherwise(0)).alias("nb"),
    )
    for _ in range(3):
        out = distributed_cumsum(v, [F.col("k")], F.col("n"), cum_col="cum")
        rows = sorted(out.collect(), key=lambda r: r["k"])
        run = 0
        for r in rows:
            run += r["n"]
            assert r["cum"] == run, f"prefix corruption at k={r['k']}"


# ---------------------------------------------------------------------------
# Round-3 adversarial skew-stress (verdict r2 #6): the range-sampler
# re-execution hazard was caught by ONE twin test by accident; these
# runs provoke it deliberately — heavy duplicate sort keys with a
# unique tiebreak, a lumpy distribution (most mass on 3 keys), input
# larger than the sampler reservoir, and an UNSTABLE upstream row order
# (hash-shuffle + aggregate) — and assert partitioning invariance
# across cluster shapes (num_partitions 3 / 8 / 16 on the local[4]
# test session vs the bench's local[32]-like widths).
# ---------------------------------------------------------------------------


def _adversarial_df(spark):
    """~120k rows, 70% of them on 3 duplicate sort keys, routed through
    a hash repartition + join + aggregate so upstream row order is NOT
    stable across re-executions (the exact shape of the sampler
    hazard documented in _with_pid)."""
    base = spark.range(120_000).select(
        F.col("id"),
        F.when(F.col("id") % 10 < 7, (F.col("id") % 3))
        .otherwise(3 + F.col("id") % 47)
        .alias("k"),
        ((F.col("id") * 2654435761) % 97 - 48).alias("v"),
    )
    # destabilize: shuffle by hash of v, aggregate back per id (row order
    # after this depends on task scheduling, not on id)
    return (
        base.repartition(16, "v")
        .groupBy("id")
        .agg(F.max("k").alias("k"), F.max("v").alias("v"))
    )


@pytest.mark.slow
def test_skew_stress_row_number_partitioning_invariance(spark):
    df = _adversarial_df(spark)
    order = [F.col("k"), F.col("id")]
    expected = None
    for parts in (3, 8, 16):
        got = {
            r["id"]: r["rn"]
            for r in distributed_row_number(
                df, order, rn_col="rn", num_partitions=parts
            ).collect()
        }
        assert sorted(got.values()) == list(range(1, 120_001))
        if expected is None:
            # ground truth once: rank of (k, id) in the total order
            rows = sorted((r["k"], r["id"]) for r in df.collect())
            expected = {i: rn for rn, (_, i) in enumerate(rows, start=1)}
        assert got == expected, f"parts={parts}"


@pytest.mark.slow
def test_skew_stress_cumsum_and_cummin_partitioning_invariance(spark):
    from kafka_avro_order_processor_eg_4131_spark.operators.ranking import (
        distributed_cummin_exclusive,
    )

    df = _adversarial_df(spark)
    order = [F.col("k"), F.col("id")]
    rows = sorted((r["k"], r["id"], r["v"]) for r in df.collect())
    exp_cum, acc = {}, 0
    exp_min, run_min = {}, None
    for k, i, v in rows:
        acc += v
        exp_cum[i] = acc
        exp_min[i] = run_min
        run_min = v if run_min is None else min(run_min, v)
    for parts in (3, 8, 16):
        got_cum = {
            r["id"]: r["cum"]
            for r in distributed_cumsum(
                df, order, F.col("v"), cum_col="cum", num_partitions=parts
            ).collect()
        }
        assert got_cum == exp_cum, f"cumsum parts={parts}"
        got_min = {
            r["id"]: r["m"]
            for r in distributed_cummin_exclusive(
                df, order, F.col("v"), out_col="m", num_partitions=parts
            ).collect()
        }
        assert got_min == exp_min, f"cummin parts={parts}"
